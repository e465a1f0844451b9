package graft.operators

import graft.SparkTestBase
import graft.functions.Kernels
import graft.functions.Portable.{h60Scala, md5HexScala}

/** d17's rewrite checked against a from-scratch Scala reimplementation
  * (window hashing, shared-span detection, interval cover, rejoin) on
  * the real table — none of the operator's join/kernel machinery, so a
  * regression in the cut arithmetic fails even if the DuckDB oracle's
  * formulation drifted in the same direction.
  */
class SpanCutSpec extends SparkTestBase {

  test("d17 equals an independently-computed span cut on sf0.001") {
    val d = "/root/testdata/sf0.001"
    val w = 12
    val raw = graft.core.Tables.documents(spark, d)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), Kernels.lowerTokens(r.getString(1))))
    val spanDocs = scala.collection.mutable.Map[Long, Set[Long]]()
      .withDefaultValue(Set.empty)
    for ((id, toks) <- raw; i <- 0 to toks.length - w)
      spanDocs(h60Scala(toks.slice(i, i + w).mkString(" "))) += id
    val shared = spanDocs.collect { case (h, ds) if ds.size >= 2 => h }.toSet
    val expected = raw.map { case (id, toks) =>
      val covered = new Array[Boolean](toks.length)
      for (i <- 0 to toks.length - w
           if shared(h60Scala(toks.slice(i, i + w).mkString(" ")));
           j <- i until i + w) covered(j) = true
      val kept = toks.indices.collect { case i if !covered(i) => toks(i) }
      (id, (toks.length.toLong, covered.count(identity).toLong,
        md5HexScala(kept.mkString(" "))))
    }.toMap
    val got = graft.SparkEntry.queries("d17_span_cut")(spark, d)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got === expected,
      "d17 must equal the plain-Scala window-cover rewrite")
    // the fixture data must actually exercise cutting (planted near-dups
    // share 12-token spans), or this test proves nothing
    assert(got.values.exists(_._2 > 0), "no spans were cut — fixture too weak")
    assert(got.values.exists(v => v._2 == 0 && v._1 > 0),
      "every doc fully cut or untouched — cover logic unexercised")
  }
}
