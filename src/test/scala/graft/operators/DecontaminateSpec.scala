package graft.operators

import graft.SparkTestBase

/** The external-eval-table path of [[Dedup.decontaminate]]: the d12 gate
  * exercises the default doc_id % 10 = 7 slice (oracle-compared); here an
  * INDEPENDENT eval frame — the production shape, benchmark suites
  * shipped as their own table — flows end-to-end, with hand-computable
  * window overlaps.
  */
class DecontaminateSpec extends SparkTestBase {
  import spark.implicits._

  // 13-token phrases the corpus does / does not share with the eval set
  private val evalPhrase =
    "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima mike"
  private val cleanTail =
    "november oscar papa quebec romeo sierra tango uniform victor whiskey xray yankee zulu"

  test("decontaminate flags exactly the corpus docs sharing a 13-gram with the eval table") {
    val corpus = Seq(
      // doc 10: contains the eval phrase verbatim at position 3
      (10L, s"one two three $evalPhrase and then some trailing words"),
      // doc 11: clean — no 13-token window overlaps the eval set
      (11L, s"totally unrelated content $cleanTail"),
      // doc 12: the eval phrase twice -> two hits, first at 0
      (12L, s"$evalPhrase padding in the middle $evalPhrase"),
      // doc 13: only 12 tokens of the phrase — no full 13-gram hit
      (13L, "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima")
    ).toDF("doc_id", "text")
    val eval = Seq(
      (1000L, s"benchmark question says $evalPhrase verbatim"),
      (1001L, "another eval item with no corpus overlap at all whatsoever today")
    ).toDF("doc_id", "text")

    val got = Dedup.decontaminate(corpus, eval).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    // Case normalization and whitespace collapse ride the same kernel as
    // the gate, so positions are in lowercased-token space.
    assert(got.toSeq === Seq((10L, 1L, 3L), (12L, 2L, 0L)),
      s"expected docs 10 and 12 flagged with hit counts/positions, got ${got.toSeq}")
  }

  test("the external-table path matches an independently-folded window overlap") {
    // NOT the gate-vs-helper comparison an earlier version ran (the d12
    // gate routes through Dedup.decontaminate itself, so both sides
    // executed identical code and the test was tautological): the
    // expected answer here is re-derived by a plain Scala fold over the
    // raw positional windows — same inputs, none of the operator's
    // join/rollup machinery — so a regression in the external path's
    // semi-join or per-doc aggregation fails this even if the gate moves
    // in lockstep.
    import org.apache.spark.sql.functions.col
    val d = "/root/testdata/sf0.001"
    val all = graft.core.Tables.documents(spark, d)
    val external = all.filter(col("doc_id") % 10 === 7).select("doc_id", "text")
    val corpus = all.filter(col("doc_id") % 10 =!= 7).select("doc_id", "text")
    val got = Dedup.decontaminate(corpus, external)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val evalHashes = Dedup.positionalWindowsOf(external, 13)
      .select("span_hash").collect().map(_.getLong(0)).toSet
    val expected = Dedup.positionalWindowsOf(corpus, 13)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter(w => evalHashes(w._3))
      .groupBy(_._1)
      .map { case (id, ws) => (id, ws.length.toLong, ws.map(_._2).min) }
      .toSet
    assert(got === expected,
      "decontaminate must equal the plain-Scala window-overlap fold")
  }

  test("d32: incremental fold over two eval batches equals the from-scratch union recompute") {
    val corpus = Seq(
      // hit for batch A only
      (10L, s"one two three $evalPhrase and then some trailing words"),
      // hits for batch B only (the cleanTail 13-gram), two phrasings
      (11L, s"totally unrelated content $cleanTail"),
      (12L, s"prefix words here $cleanTail suffix"),
      // hits from BOTH batches: A's phrase at 0, B's phrase later
      (13L, s"$evalPhrase bridging tokens $cleanTail")
    ).toDF("doc_id", "text")
    val batchA = Seq((1000L, s"suite one asks $evalPhrase verbatim"))
      .toDF("doc_id", "text")
    val batchB = Seq((2000L, s"suite two ships $cleanTail entirely"))
      .toDF("doc_id", "text")
    val tmp = tmpDir()
    Dedup.positionalWindowsOf(batchA, 13)
      .select("span_hash").distinct()
      .write.mode("overwrite").parquet(s"$tmp/eval_hashes")
    Dedup.decontaminate(corpus, batchA)
      .write.mode("overwrite").parquet(s"$tmp/verdicts")
    val inc = Dedup.decontaminateIncrement(corpus,
        spark.read.parquet(s"$tmp/eval_hashes"),
        spark.read.parquet(s"$tmp/verdicts"), batchB)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val full = Dedup.decontaminate(corpus, batchA.unionByName(batchB))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(inc === full,
      s"incremental fold diverged from the union recompute: $inc vs $full")
    // the fixture exercises all three merge cases: batch-A-only (10),
    // batch-B-only (11, 12), and both-batches (13, counts ADDING)
    assert(full.map(_._1) === Set(10L, 11L, 12L, 13L))
    assert(inc.find(_._1 == 13L).get._2 >= 2L,
      "doc 13 must accumulate hits from BOTH batches")
  }

  test("d32: re-shipping an already-stored eval batch is a no-op (empty delta, verdicts unchanged)") {
    val corpus = Seq(
      (10L, s"one two three $evalPhrase and then some trailing words"),
      (11L, s"totally unrelated content $cleanTail")
    ).toDF("doc_id", "text")
    val batchA = Seq((1000L, s"suite one asks $evalPhrase verbatim"))
      .toDF("doc_id", "text")
    val tmp = tmpDir()
    Dedup.positionalWindowsOf(batchA, 13)
      .select("span_hash").distinct()
      .write.mode("overwrite").parquet(s"$tmp/eval_hashes")
    Dedup.decontaminate(corpus, batchA)
      .write.mode("overwrite").parquet(s"$tmp/verdicts")
    val again = Dedup.decontaminateIncrement(corpus,
        spark.read.parquet(s"$tmp/eval_hashes"),
        spark.read.parquet(s"$tmp/verdicts"), batchA)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val stored = spark.read.parquet(s"$tmp/verdicts")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(again === stored,
      "re-folding a stored batch must leave every verdict untouched")
  }

  test("d32 gate fixture is non-vacuous: both the stored batch and the new batch contribute hits") {
    import org.apache.spark.sql.functions.col
    val d = "/root/testdata/sf0.001"
    val all = graft.core.Tables.documents(spark, d)
    val corpus = all.filter(col("doc_id") % 10 =!= 7)
    val hitsA = Dedup.decontaminate(corpus,
      all.filter(col("doc_id") % 20 === 7)).count()
    val hitsB = Dedup.decontaminate(corpus,
      all.filter(col("doc_id") % 20 === 17)).count()
    assert(hitsA > 0, "stored batch (doc_id%20=7) finds no contamination " +
      "— the incremental gate would never read the store")
    assert(hitsB > 0, "new batch (doc_id%20=17) finds no contamination " +
      "— the incremental gate's delta leg would be vacuous")
  }
}
