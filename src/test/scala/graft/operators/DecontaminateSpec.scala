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

  test("contaminated docs are flagged however the eval set arrives (slice vs external)") {
    // the d12 gate's slice and an equivalent external table must agree
    val d = "/root/testdata/sf0.001"
    val all = graft.core.Tables.documents(spark, d)
    val viaSlice = graft.SparkEntry.queries("d12_decontaminate")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val external = all.filter(org.apache.spark.sql.functions.col("doc_id") % 10 === 7)
      .select("doc_id", "text")
    val viaExternal = Dedup.decontaminate(
      all.filter(org.apache.spark.sql.functions.col("doc_id") % 10 =!= 7), external)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaExternal === viaSlice)
  }
}
