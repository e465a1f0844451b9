package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions.col

/** t45 HTML extraction — the per-document claims the oracle hash
  * proves only in aggregate: script/style/comment CONTENT never leaks
  * into text, entities decode in the &amp;-last order (so &amp;lt;
  * yields literal-angle TEXT, not a tag), links count only href
  * anchors, tags match case-insensitively, the documented stray-'<'
  * grammar limits hold, and markup-free documents pass through as a
  * whitespace-normalizing no-op.
  */
class HtmlExtractSpec extends SparkTestBase {

  private lazy val out: Map[Long, (String, Long, String)] =
    graft.SparkEntry.queries("t45_html_extract")(
        spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") >= 9100000000L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
        r.getString(5)))).toMap

  test("style and script content never leaks; title extracted and whitespace-collapsed") {
    val (title0, _, text0) = out(9100000000L)
    assert(title0 === "Crawl Basics")
    assert(!text0.contains("color") && !text0.contains("red"),
      s"style content leaked: $text0")
    assert(text0 === "Crawl Basics Fetch the page and extract the main text.")
    val (title1, _, text1) = out(9100000001L)
    assert(title1 === "Spaced Title", "title must collapse internal runs")
    assert(!text1.contains("secret") && !text1.contains("12345"),
      s"script content leaked: $text1")
    assert(text1 === "Visible words only.")
    // uppercase tags strip too
    val (_, _, text9) = out(9100000009L)
    assert(!text9.contains("upper.case"), s"SCRIPT (uppercase) leaked: $text9")
    assert(text9 === "Case insensitive tags survive.")
  }

  test("entity battery decodes with &amp; last; &amp;lt; yields literal-angle text") {
    val (_, _, text2) = out(9100000002L)
    assert(text2 ===
      "Entities: fish & chips cost <5 >2 and a space plus 'quoted' " +
        "and \"cited\" text.")
    val (_, _, text10) = out(9100000010L)
    assert(text10 === "Amp edge: &lt; decodes to literal-angle text not a tag.",
      "double-decoding &amp;lt; would produce a bare < here")
  }

  test("comments never leak; links count href anchors only; self-closing tags vanish") {
    val (_, _, text3) = out(9100000003L)
    assert(!text3.contains("hidden") && !text3.contains("Fake"),
      s"comment content leaked: $text3")
    assert(text3 === "Comment content must not leak.")
    val (_, links4, _) = out(9100000004L)
    assert(links4 === 2L, "the href-less anchor must not count")
    val (_, links11, text11) = out(9100000011L)
    assert(links11 === 1L)
    assert(text11 === "Breaks and images vanish. rel link")
  }

  test("grammar limits and degenerate shapes: stray '<', empty body, markup-free passthrough") {
    val (_, _, text6) = out(9100000006L)
    assert(text6 === "Unclosed paragraph dangling bold then a trailing stray < survives",
      "a trailing '<' with no closing '>' must survive as text")
    val (title7, _, text7) = out(9100000007L)
    assert(title7 === "Empty Body" && text7 === "")
    val (_, _, text8) = out(9100000008L)
    assert(text8 === "no markup at all just plain words")
    val (_, _, text5) = out(9100000005L)
    assert(text5 === "Nested bold italic runs alpha beta")
  }

  test("numeric character references: decimal, hex, case-insensitive x, non-BMP; invalid forms stay literal") {
    val (_, _, text12) = out(9100000012L)
    assert(text12 ===
      "Numeric: café and tab stop and snow ☃ plus hex ☃ " +
        "and 😀 emoji.",
      s"numeric decode drifted: $text12")
    val (_, _, text13) = out(9100000013L)
    assert(text13 ===
      "Invalid: &#0; and &#xD800; and &#99999999; and &#x; and " +
        "unterminated &#12 stay literal.",
      s"an invalid reference decoded or was mangled: $text13")
  }

  test("decode ordering: &amp;-encoded numerics stay literal; a numeric '&' can re-form a named entity for the later stage") {
    val (_, _, text14) = out(9100000014L)
    // &amp;#60; / &amp;#62; — the numeric pass sees no '&#' (the amp is
    // still encoded) and the amp-LAST named decode leaves '&#60;'
    // literal; &#38;#62; — the numeric pass consumes '&#38;', the
    // emitted '&' is never rescanned, '#62;' follows it literally;
    // &#38;lt; — the staged grammar's honest consequence: the numeric
    // stage emits '&lt;' and the SUBSEQUENT named stage decodes it
    assert(text14 ===
      "Order: &#60;b&#62; is not a tag, &#62; is literal, and < " +
        "re-forms a named entity.",
      s"decode ordering drifted: $text14")
  }

  test("generative numeric-entity soup: never throws, sentinels decode/survive exactly, engine matches the interpreted twin") {
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val frag = Gen.oneOf(
      Gen.oneOf("alpha", " ", "&#9731;", "&#x2603;", "&#X48;", "&#233;",
        "&amp;#60;", "&#38;", "&#0;", "&#xD800;", "&#99999999;", "&#x;",
        "&#12", "&#", "&", ";", "<p>", "</p>", "<b", "b>"),
      Gen.chooseNum(1, 1114111).map(cp => s"&#$cp;"),
      Gen.chooseNum(1, 1114111).map(cp => s"&#x${cp.toHexString};"),
      Gen.asciiPrintableStr.map(_.take(6)
        .filterNot(c => c == '&' || c == '\t' || c == '\n')))
    val soup = Gen.listOfN(14, frag).map(_.mkString(""))
    val docs = Iterator.from(0).map(i =>
      soup.apply(Gen.Parameters.default, Seed(63L + i))).flatten
      .take(150).toSeq.zipWithIndex
      .map { case (h, i) => (i.toLong, h) }
    val got = TextAnalysis.htmlExtract(docs.toDF("doc_id", "html"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getString(5)))
    assert(got.length === docs.length, "a row was lost or duplicated")
    // the spec-side reference pipeline: the SAME staged grammar, but
    // driven through the INTERPRETED NcrDecode twin and plain Scala
    // regex — a codegen bug in the generated scan cannot hide from this
    val named = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
    def reference(html: String): String = {
      val stripped = html
        .replaceAll("(?is)<script[^>]*>.*?</script>", " ")
        .replaceAll("(?is)<style[^>]*>.*?</style>", " ")
        .replaceAll("(?s)<!--.*?-->", " ")
        .replaceAll("(?is)<head[^>]*>.*?</head>", " ")
        .replaceAll("(?s)<[^>]*>", " ")
      val decoded = named.foldLeft(
        graft.plans.NcrDecode.decode(stripped)) {
        case (s, (from, to)) => s.replace(from, to)
      }
      // Spark's trim strips SPACES only (Java's String.trim would also
      // eat decoded control codepoints ≤ 0x20 and silently diverge)
      decoded.replaceAll("\\s+", " ").replaceAll("^ | $", "")
    }
    val byId = docs.toMap
    got.foreach { case (id, nChars, nTokens, text) =>
      val want = reference(byId(id))
      assert(text === want,
        s"doc $id diverged from the interpreted reference:\n got $text\nwant $want\n raw ${byId(id)}")
      assert(nChars === text.codePointCount(0, text.length).toLong,
        s"doc $id n_chars drifted (codepoint grain)")
      assert(nTokens ===
        (if (text.isEmpty) 0L else text.split(" ", -1).length.toLong),
        s"doc $id n_tokens drifted")
    }
  }

  test("generative tag soup: never throws, output shape consistent, no complete tag survives, script secrets never leak") {
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // entity-free soup fragments: words, whole tags, half tags, bare
    // brackets, and ONE atomic script fragment carrying a sentinel —
    // the lazy script match must remove the sentinel no matter what
    // unpaired openers/closers surround it
    val frag = Gen.oneOf(
      Gen.oneOf("alpha", "beta", " ", "  ", ">", "<", "<p>", "</p>",
        "<b", "b>", "<a href='x'>link</a>", "</script>", "<ScRiPt>",
        "<!--", "-->", "<!-- note -->", "<head>", "</head>"),
      Gen.asciiPrintableStr.map(_.take(8)
        .filterNot(c => c == '&' || c == '\t' || c == '\n')))
    val soup = Gen.listOfN(12, frag).map(_.mkString(""))
      .map { s =>
        val cut = s.length / 2
        s.take(cut) + "<script>ZZSECRETZZ</script>" + s.drop(cut)
      }
    val docs = Iterator.from(0).map(i =>
      soup.apply(Gen.Parameters.default, Seed(45L + i))).flatten
      .take(150).toSeq.zipWithIndex
      .map { case (h, i) => (i.toLong, h) }
    val out = TextAnalysis.htmlExtract(docs.toDF("doc_id", "html"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getString(5)))
    assert(out.length === docs.length, "a row was lost or duplicated")
    out.foreach { case (id, _, links, nChars, nTokens, text) =>
      assert(nChars === text.length.toLong, s"doc $id n_chars drifted")
      assert(nTokens ===
        (if (text.isEmpty) 0L else text.split(" ", -1).length.toLong),
        s"doc $id n_tokens drifted")
      assert(links >= 0L)
      assert(!text.contains("ZZSECRETZZ"),
        s"doc $id leaked script content: $text")
      // entity-free input ⇒ no complete <...> span can survive the
      // global strip (every surviving '<' has no later '>')
      assert(!text.matches("(?s).*<[^>]*>.*"),
        s"doc $id kept a complete tag: $text")
    }
  }
}
