package graft.operators

import graft.SparkTestBase
import graft.functions.Portable
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck-generated property tests (SURVEY §5): cross-implementation
  * consistency (driver-side vs Catalyst vs codegen), unpivot↔pivot
  * round-trip, and QC flag monotonicity in thresholds. Generated inputs
  * are batched into single Spark jobs (one job per property, not per
  * case).
  */
class PropertiesSpec extends SparkTestBase {
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    Iterator.from(0).map(i =>
      g.apply(Gen.Parameters.default, Seed(seed + i))
    ).flatten.take(n).toSeq

  test("h60Scala (driver twin) equals the Catalyst h60 on random strings") {
    val strs = sample(Gen.asciiPrintableStr.map(_.take(40)), 200, 1L)
      .filter(_.nonEmpty).distinct
    val fromSpark = strs.toDF("s")
      .select(col("s"), Portable.h60(col("s")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    strs.foreach { s =>
      assert(fromSpark(s) === Portable.h60Scala(s), s"h60 mismatch for $s")
    }
  }

  test("codegen graft_dot equals the interpreted aggregate fold bit-exactly") {
    graft.plans.VectorExpressions.register(spark)
    val vecGen = Gen.listOfN(64, Gen.chooseNum(-1e3, 1e3)).map(_.toArray)
    val pairs = sample(Gen.zip(vecGen, vecGen), 100, 2L)
    val df = pairs.toDF("a", "b")
      .select(
        Portable.dotFast(col("a"), col("b")).as("fast"),
        Portable.dot(col("a"), col("b"), 64).as("slow"))
    df.collect().foreach { r =>
      val (f, s) = (r.getDouble(0), r.getDouble(1))
      assert(java.lang.Double.doubleToRawLongBits(f) ===
        java.lang.Double.doubleToRawLongBits(s))
    }
  }

  test("codegen graft_center equals the per-element spelling bit-exactly; null passes through") {
    graft.plans.VectorExpressions.register(spark)
    val vecGen = Gen.listOfN(16, Gen.chooseNum(-1e3, 1e3)).map(_.toArray)
    val vecs = sample(vecGen, 100, 3L)
    val df = vecs.toDF("v")
      .select(
        Portable.centerFast(col("v")).as("fast"),
        array((1 to 16).map(i => element_at(col("v"), i) -
          (1 to 16).map(j => element_at(col("v"), j)).reduce(_ + _)
            / lit(16.0)): _*).as("slow"))
    df.collect().foreach { r =>
      val (f, s) = (r.getSeq[Double](0), r.getSeq[Double](1))
      assert(f.length === 16)
      f.zip(s).foreach { case (a, b) =>
        assert(java.lang.Double.doubleToRawLongBits(a) ===
          java.lang.Double.doubleToRawLongBits(b))
      }
    }
    // a centered vector sums to ~0 and the transform is idempotent up to
    // representation error only when the mean is exactly representable —
    // pin the EXACT invariant instead: null input stays null
    val n = Seq[Option[Array[Double]]](None, Some(Array(1.0, 2.0, 3.0)))
      .toDF("v").select(Portable.centerFast(col("v")).as("c")).collect()
    assert(n(0).isNullAt(0))
    assert(n(1).getSeq[Double](0) === Seq(-1.0, 0.0, 1.0))
  }

  test("graft_kmv equals brute-force bottom-k of distinct across shuffled partitions") {
    graft.plans.SketchAggregates.register(spark)
    // heavy duplication + several groups; repartition(7) forces partial
    // buffers through serialize/merge before the final eval
    val rows = sample(Gen.zip(Gen.chooseNum(0, 3), Gen.chooseNum(0L, 500L)),
      2000, 11L)
    val df = rows.toDF("g", "h").repartition(7)
    val got = df.groupBy("g")
      .agg(Portable.kmvSketch(col("h"), 16).as("sk"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    val expect = rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(_._2).distinct.sorted.take(16)
    }
    expect.foreach { case (g, want) =>
      assert(got(g) === want, s"group $g sketch mismatch")
    }
  }

  test("graft_kmv with k above the distinct count is the exact sorted set; nulls ignored") {
    graft.plans.SketchAggregates.register(spark)
    val df = Seq[(Int, java.lang.Long)](
      (1, 5L), (1, 3L), (1, 5L), (1, null), (1, 9L), (2, null))
      .toDF("g", "h").repartition(3)
    val got = df.groupBy("g")
      .agg(Portable.kmvSketch(col("h"), 64).as("sk"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    assert(got(1) === Seq(3L, 5L, 9L))
    assert(got(2) === Seq.empty)
  }

  test("unpivot drops zeros and pivot(sum)+zero-fill round-trips the matrix") {
    val cellGen = Gen.frequency(3 -> Gen.const(0L), 2 -> Gen.chooseNum(1L, 99L))
    val rows = sample(Gen.listOfN(4, cellGen), 30, 3L).zipWithIndex
      .map { case (cells, i) => (s"ASV_$i", cells(0), cells(1), cells(2), cells(3)) }
    val samplesCols = Seq("s1", "s2", "s3", "s4")
    val wide = rows.toDF("asv" +: samplesCols: _*)
    val long = wide.unpivot(Array(col("asv")), samplesCols.map(col).toArray,
      "sample", "count").filter(col("count") =!= 0L)
    val back = long.groupBy("asv").pivot("sample", samplesCols)
      .sum("count")
      .na.fill(0L, samplesCols)
    val orig = rows.map(r => r._1 -> Seq(r._2, r._3, r._4, r._5)).toMap
    back.collect().foreach { r =>
      assert(samplesCols.zipWithIndex.forall { case (c, i) =>
        r.getAs[Long](c) == orig(r.getString(0))(i)
      }, s"row ${r.getString(0)} mismatch")
    }
    // ASVs whose cells are all zero legitimately vanish from the long form
    val nonZeroAsvs = rows.filter(r => Seq(r._2, r._3, r._4, r._5).exists(_ != 0))
    assert(back.count() === nonZeroAsvs.length)
  }

  // Generator for nasty document text: vocab with case, digits, unicode
  // (2- and 3-byte UTF-8), separated by random runs drawn from the full
  // regex-\s whitespace set — the inputs where a kernel/column-expression
  // divergence would hide.
  private val textGen: Gen[String] = {
    val word = Gen.oneOf("The", "cat", "SAT", "on", "MAT", "héllo",
      "世界", "a1", "42", "x-y", "...")
    val ws = Gen.nonEmptyListOf(
      Gen.oneOf(' ', '\t', '\n', '\u000B', '\f', '\r')).map(_.mkString)
    Gen.chooseNum(0, 30).flatMap(n =>
      Gen.listOfN(n, Gen.zip(word, ws))
        .map(_.map { case (w, s) => w + s }.mkString))
  }

  test("Kernels.lowerTokens equals the Catalyst tokens(normText(...)) on random text") {
    val texts = sample(textGen, 200, 4L).distinct
    val fromSpark = texts.toDF("t")
      .select(col("t"), Portable.tokens(Portable.normText(col("t"))).as("toks"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    texts.foreach { t =>
      assert(graft.functions.Kernels.lowerTokens(t).toSeq === fromSpark(t),
        s"tokenization diverged for ${t.take(60).replace("\n", "\\n")}")
    }
  }

  test("Kernels.shingles/minShingle equal the t04-style column formulation") {
    // the exact expression t04 computed before the kernel rewrite — the
    // rewrite must be a pure performance change
    val texts = sample(textGen, 150, 5L).distinct
    val fromSpark = texts.toDF("t")
      .select(col("t"),
        transform(Portable.wordNgrams(
          Portable.tokens(Portable.normText(col("t"))), 3),
          g => Portable.h60(g)).as("hs"),
        array_min(transform(Portable.wordNgrams(
          Portable.tokens(Portable.normText(col("t"))), 3),
          g => Portable.h60(g))).as("mn"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getSeq[Long](1), if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toMap
    texts.foreach { t =>
      val toks = graft.functions.Kernels.lowerTokens(t)
      val (wantHs, wantMn) = fromSpark(t)
      assert(graft.functions.Kernels.shingles(toks).toSeq === wantHs,
        s"shingle hashes diverged for ${t.take(60)}")
      assert(graft.functions.Kernels.minShingle(toks) === wantMn,
        s"min shingle diverged for ${t.take(60)}")
    }
  }

  test("Kernels.simhash60 equals a naive per-bit weighted-vote recompute") {
    val texts = sample(textGen, 200, 6L).distinct
    texts.foreach { t =>
      val toks = graft.functions.Kernels.lowerTokens(t)
      val naive = (0 until 60).foldLeft(0L) { (acc, b) =>
        val vote = toks.distinct.map { x =>
          val h = Portable.h60Scala(x)
          toks.count(_ == x).toLong * (((h >> b) & 1L) * 2L - 1L)
        }.sum
        if (vote > 0) acc | (1L << b) else acc
      }
      assert(graft.functions.Kernels.simhash60(toks) === naive,
        s"simhash diverged for ${t.take(60)}")
    }
  }

  test("QC flags are monotone in thresholds: stricter warn ⇒ superset of flags") {
    import graft.compendium.{QcThresholds, SummaryQC}
    val qc = SummaryQC.readSummaryTsv(spark, s"$fixtures/summary_paired.tsv")
    def warnSet(th: QcThresholds): Set[String] =
      SummaryQC.sampleQc(qc, th).filter(col("retained_warn"))
        .select("srr").collect().map(_.getString(0)).toSet
    val loose = warnSet(QcThresholds(retainedWarn = 0.5))
    val mid = warnSet(QcThresholds(retainedWarn = 0.69))
    val strict = warnSet(QcThresholds(retainedWarn = 0.9))
    assert(loose.subsetOf(mid))
    assert(mid.subsetOf(strict))
  }

  test("JVM XXH64 band fold equals Catalyst xxhash64(lit(j), mh0, mh1, mh2)") {
    // the streaming near-dup frontier buckets with a driver-side XXH64
    // chain; it must produce the BATCH band keys (d03/d14's
    // xxhash64(band, 3 signature rows)) bit-for-bit, or stream and batch
    // candidate sets silently diverge
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val g = Gen.zip(Gen.chooseNum(0, 9),
      Gen.listOfN(3, Gen.chooseNum(0L, graft.functions.Portable.MinHashP)))
    val cases = sample(g, 150, 11L).map { case (j, ms) =>
      (j, ms(0), ms(1), ms(2))
    }
    val fromSpark = cases.toDF("j", "m0", "m1", "m2")
      .select(xxhash64(col("j"), col("m0"), col("m1"), col("m2")).as("h"))
      .collect().map(_.getLong(0))
    cases.zip(fromSpark).foreach { case ((j, m0, m1, m2), want) =>
      var h = XXH64.hashInt(j, 42L)
      h = XXH64.hashLong(m0, h)
      h = XXH64.hashLong(m1, h)
      h = XXH64.hashLong(m2, h)
      assert(h === want, s"fold mismatch for ($j, $m0, $m1, $m2)")
    }
  }

  test("Kernels.int8Quant: codes bounded, error within half a quantization step, scale exact") {
    val vecGen = Gen.listOfN(64,
      Gen.chooseNum(-10f, 10f)).map(_.toArray)
    val vecs = sample(vecGen, 200, 11L) :+ Array.fill(64)(0f)
    vecs.foreach { v =>
      val (amax, codes, errs) = graft.functions.Kernels.int8Quant(v)
      assert(amax === v.map(x => math.abs(x.toDouble)).max,
        "amax must be the exact max-abs selection")
      assert(codes.forall(c => c >= -127L && c <= 127L),
        s"codes must fit int8's symmetric range: ${codes.mkString(",")}")
      if (amax == 0) {
        assert(codes.forall(_ == 0L) && errs.forall(_ == 0.0),
          "the zero vector must quantize losslessly")
      } else {
        // half a step amax/254, with 3 ULP of headroom for the three
        // pinned IEEE roundings in the code/error chain
        val bound = amax / 254.0 * (1.0 + 1e-12)
        errs.zipWithIndex.foreach { case (e, i) =>
          assert(e <= bound,
            s"dim $i reconstruction error $e exceeds half-step $bound (amax=$amax)")
        }
        // the extreme magnitude dim must hit a full-scale code
        val iMax = v.indexWhere(x => math.abs(x.toDouble) == amax)
        assert(math.abs(codes(iMax)) === 127L,
          "the max-magnitude dimension must quantize to full scale")
      }
    }
  }

  test("Kernels.diversityMoments equals a naive multiset recompute on random text") {
    import graft.functions.Kernels
    val wordGen = Gen.oneOf("a", "bb", "ccc", "dd", "a", "e f", "", "  ")
    val textGen = Gen.listOf(wordGen).map(_.mkString(" "))
    sample(textGen, 300, 9L).foreach { text =>
      val toks = Kernels.tokenize(text)
      val (n, types, sq, hapax) = Kernels.diversityMoments(toks)
      val counts = toks.groupBy(identity).view.mapValues(_.length.toLong)
      assert(n === toks.length.toLong)
      assert(types === counts.size.toLong)
      assert(sq === counts.values.map(c => c * c).sum)
      assert(hapax === counts.values.count(_ == 1L).toLong)
      // the meaning t12's gini_num publishes: n² − Σc² counts exactly the
      // ordered token pairs that DIFFER
      val unequalPairs =
        (for (a <- toks; b <- toks if a != b) yield 1).length.toLong
      assert(n * n - sq === unequalPairs)
    }
  }

  test("Kernels.bpeApply equals the oracle's sequential delimiter-replace on random words") {
    import graft.functions.Kernels
    // a 4-atom alphabet with 6 random merges maximizes cascade
    // interactions (aa on aaaa, overlapping x/y roles, dead merges);
    // the fourth atom is SUPPLEMENTARY-plane (2 UTF-16 units) so the
    // property also pins the codepoint basis the oracle splits on
    val gclef = new String(Character.toChars(0x1D11E))
    val atoms = Seq("a", "b", "c", gclef)
    val wordGen = Gen.nonEmptyListOf(Gen.oneOf(atoms))
      .map(_.take(24).mkString)
    val mergeGen = Gen.listOfN(6,
      Gen.zip(Gen.oneOf(atoms), Gen.oneOf(atoms))).map(_.distinct)
    val RS = "\u001e"
    sample(Gen.zip(wordGen, mergeGen), 400, 11L).foreach { case (w, ms) =>
      val kernel = Kernels.bpeApply(w, ms.map { case (x, y) => x + y }
        .toArray).toSeq
      // the t25 oracle's algorithm verbatim: wrap each CODEPOINT as
      // RS c RS (DuckDB's string_split(w, '') basis), then per merge one
      // global left-to-right non-overlapping
      // replace(RS x RS RS y RS -> RS xy RS) — String.replace and
      // DuckDB's replace share that contract
      var s = Kernels.codepointAtoms(w).map(a => s"$RS$a$RS").mkString
      for ((x, y) <- ms) s = s.replace(s"$RS$x$RS$RS$y$RS", s"$RS$x$y$RS")
      val ref = s.stripPrefix(RS).stripSuffix(RS).split(s"$RS$RS").toSeq
      assert(kernel === ref, s"word=$w merges=$ms")
    }
  }

  test("codepoint kernels treat supplementary characters as single atoms (the t22/t25/t39 oracle basis)") {
    import graft.functions.Kernels
    val gclef = new String(Character.toChars(0x1D11E)) // 2 UTF-16 units
    val emoji = new String(Character.toChars(0x1F600))
    val w = s"a${gclef}b$emoji"
    assert(w.length === 6, "sanity: the UTF-16 basis would see 6 units")
    assert(Kernels.codepointAtoms(w).toSeq === Seq("a", gclef, "b", emoji))
    assert(Kernels.codepointPairs(w).toSeq ===
      Seq(s"a$gclef", s"${gclef}b", s"b$emoji"),
      "pairs must never split a surrogate pair in half")
    assert(Kernels.bpeApply(w, Array(s"${gclef}b")).toSeq ===
      Seq("a", s"${gclef}b", emoji),
      "a merge whose x is supplementary must apply as one pair")
    // the t39 n_chars basis: 4 codepoints (the oracle's len()), not 6
    assert(w.codePointCount(0, w.length) === 4)
  }
}
