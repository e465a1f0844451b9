package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions.col

/** t46 URL canonicalization — the per-URL rules the domain-grain oracle
  * hash only sees in aggregate: case/default-port/fragment handling,
  * NAME-scoped tracking-param filtering, registrable-domain extraction
  * (multi-label suffixes, IPv4, single-label hosts), the documented
  * trailing-punctuation grammar limit, and idempotence (canonicalizing
  * a canonical form is a no-op — the property that makes `canon` a
  * stable dedup key for an incremental frontier store).
  */
class UrlCanonicalizeSpec extends SparkTestBase {

  private def extract(texts: Seq[String]) = {
    import spark.implicits._
    TextAnalysis.urlCanonical(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"))
      .collect().map(r => (r.getString(1), r.getString(2), r.getString(3)))
  }

  test("per-URL canonicalization rules: case, ports, fragments, tracking params, paths") {
    def canonOf(u: String) = extract(Seq(u)).head._2
    // scheme+host lowercase, default port strip, fragment drop
    assert(canonOf("HTTP://Example.COM:80/Path/To?x=1#frag")
      === "http://example.com/Path/To?x=1")
    // https :443 strips; a NON-default port survives in the canon
    assert(canonOf("https://Shop.Example.co.UK:443/a")
      === "https://shop.example.co.uk/a")
    assert(canonOf("https://shop.example.co.uk:8443/a?utm_source=x&id=7")
      === "https://shop.example.co.uk:8443/a?id=7")
    // tracking-only query drops the '?'
    assert(canonOf("https://a.example.org/p?utm_campaign=z&utm_medium=m")
      === "https://a.example.org/p")
    // empty path → '/'
    assert(canonOf("http://example.com") === "http://example.com/")
    // filtering is by param NAME: value 'utm_x' survives, ref= drops
    assert(canonOf("https://q.example.net/s?a=utm_x&ref=hp&q=alpha")
      === "https://q.example.net/s?a=utm_x&q=alpha")
    // gclid drops by name, other params keep their order
    assert(canonOf("http://192.168.0.1:8080/x?gclid=g&keep=1")
      === "http://192.168.0.1:8080/x?keep=1")
  }

  test("registrable domains: multi-label suffix list, IPv4, single-label, non-default ports excluded") {
    def domainOf(u: String) = extract(Seq(u)).head._3
    assert(domainOf("https://shop.example.co.uk:8443/a") === "example.co.uk")
    assert(domainOf("https://deep.sub.example.com/x") === "example.com")
    assert(domainOf("http://192.168.0.1:8080/x") === "192.168.0.1")
    assert(domainOf("http://localhost:9000/z") === "localhost")
    assert(domainOf("https://site.com.au/p") === "site.com.au")
  }

  test("grammar limits: trailing sentence punctuation strips; fragment-only variants collapse to one canon") {
    val rows = extract(Seq(
      "see https://news.example.com/story. then https://news.example.com/story!",
      "x https://dup.example.com/page#a y https://dup.example.com/page#b z"))
    val canons = rows.map(_._2)
    assert(canons.count(_ == "https://news.example.com/story") === 2,
      "trailing . and ! must strip to the same canonical form")
    assert(canons.count(_ == "https://dup.example.com/page") === 2,
      "fragment-only variants must collapse")
  }

  test("generative URL soup: never throws, scheme/host always lowercase, no fragment survives, idempotent") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val frag = Gen.oneOf(
      Gen.oneOf("http://", "https://", "HTTP://", "Example.COM", ":80",
        ":443", ":8443", "/Path", "?", "?a=1", "&utm_source=x", "&b=2",
        "#frag", ".", " ", "www.", "co.uk", "192.168.0.1", "..", "&",
        "=", "localhost"),
      Gen.asciiPrintableStr.map(_.take(5)
        .filterNot(c => c == '\t' || c == '\n')))
    val soup = Gen.listOfN(10, frag).map(_.mkString(""))
    val texts = Iterator.from(0).map(i =>
      soup.apply(Gen.Parameters.default, Seed(91L + i))).flatten
      .take(200).toSeq
    val rows = extract(texts) // must not throw, whatever the soup
    rows.foreach { case (_, canon, domain) =>
      val scheme = canon.takeWhile(_ != ':')
      assert(scheme == scheme.toLowerCase, s"scheme case survived: $canon")
      assert(!canon.contains("#"), s"fragment survived: $canon")
      assert(domain == domain.toLowerCase, s"domain case survived: $domain")
    }
    // idempotence over every generated canonical form, one pass
    val canons = rows.map(_._2).toSeq
    if (canons.nonEmpty) {
      val again = extract(canons.map(c => s"x $c x")).map(_._2)
      assert(again.sorted === canons.sorted,
        s"re-canonicalization changed ${canons.diff(again).take(3)}")
    }
  }

  test("canonicalization is idempotent: canon(canon(u)) == canon(u) across the fixture battery") {
    import spark.implicits._
    val fix = spark.read.option("sep", "\t").option("header", "true")
      .schema("doc_id LONG, text STRING")
      .csv("/root/repo/fixtures/url_docs.tsv")
    val first = TextAnalysis.urlCanonical(fix)
      .select("canon").as[String].collect()
    assert(first.nonEmpty)
    val second = extract(first.map(c => s"pad $c pad").toSeq).map(_._2)
    assert(second.toSeq.sorted === first.toSeq.sorted,
      "re-canonicalizing canonical URLs must be a no-op")
  }
}
