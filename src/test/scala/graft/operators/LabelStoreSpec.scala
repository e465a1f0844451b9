package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Multi-batch evolution of the d19 component-label store — the round-10
  * build/consume split applied to the last recompute-not-reuse seam:
  * [[Dedup.corpusLabels]] builds the converged (doc_id, canonical_id)
  * sidecar once; [[Dedup.incrementalLabelsOf]] folds each new batch's
  * near-dup pairs into it touching only the components the batch reaches.
  *
  * The load-bearing assertions, in the IncrementalStoreSpec discipline:
  *  - **fold ≡ rebuild**: a store grown batch-by-batch equals the
  *    one-shot labels of the full corpus — for any batch split, and
  *    composed across TWO successive folds.
  *  - **Label stability**: a doc's canonical changes ONLY when a batch
  *    pair genuinely bridges its component (the changed-doc set is
  *    contained in the touched-component set), and then only DOWNWARD
  *    (min over a superset) — new arrivals can never steal a canonical
  *    upward, matching d16's arrival-order discipline.
  */
class LabelStoreSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def corpus: DataFrame =
    graft.core.Tables.documents(spark, sf).select("doc_id", "text")

  /** Exact Jaccard ≥ 0.5 pairs of `docFrame` — the same generator the
    * label build uses.
    */
  private def pairsOf(docFrame: DataFrame): DataFrame =
    Dedup.jaccardPairs(
        Dedup.explodedShinglesOf(docFrame).localCheckpoint(true), 0.5)
      .select(col("doc_a"), col("doc_b"))

  /** Pairs of the grown corpus that involve at least one doc of `batch`
    * — what a production pair generator (the d15 signature path) hands
    * the label fold when `batch` arrives on top of `prev`.
    */
  private def newPairs(prev: DataFrame, batch: DataFrame): DataFrame = {
    val ids = batch.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val inBatch = udf((id: Long) => ids.contains(id))
    pairsOf(prev.unionByName(batch))
      .filter(inBatch(col("doc_a")) || inBatch(col("doc_b")))
  }

  private def labelMap(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap

  test("one fold over a grown corpus equals the full rebuild") {
    val store = tmpDir() + "/labelstore1"
    val prev = corpus.filter(col("doc_id") % 5 =!= 4)
    val batch = corpus.filter(col("doc_id") % 5 === 4)
    Dedup.corpusLabels(prev).write.mode("overwrite").parquet(store)
    val folded = labelMap(
      Dedup.incrementalLabelsOf(newPairs(prev, batch), store))
    val rebuilt = labelMap(Dedup.corpusLabels(corpus))
    assert(folded === rebuilt,
      "incremental fold must equal the one-shot corpus labels")
  }

  test("two successive folds compose to the full rebuild; canonicals only move down, only when touched") {
    val s1 = tmpDir() + "/labelstore_a"
    val s2 = tmpDir() + "/labelstore_b"
    val b1 = corpus.filter(col("doc_id") % 5 < 3)
    val b2 = corpus.filter(col("doc_id") % 5 === 3)
    val b3 = corpus.filter(col("doc_id") % 5 === 4)
    Dedup.corpusLabels(b1).write.mode("overwrite").parquet(s1)
    val day1 = labelMap(graft.core.Tables.documents(spark, sf).sparkSession
      .read.parquet(s1))

    val p2 = newPairs(b1, b2).localCheckpoint(true)
    Dedup.incrementalLabelsOf(p2, s1).write.mode("overwrite").parquet(s2)
    val day2 = labelMap(spark.read.parquet(s2))

    val p3 = newPairs(b1.unionByName(b2), b3).localCheckpoint(true)
    val day3 = labelMap(Dedup.incrementalLabelsOf(p3, s2))

    val rebuilt = labelMap(Dedup.corpusLabels(corpus))
    assert(day3 === rebuilt,
      "two folds on top of the day-1 store must equal the one-shot labels")

    // stability: a stored doc's canonical moves only DOWNWARD (min over
    // a superset of nodes can never increase) ...
    for ((doc, c1) <- day1; c3 <- day3.get(doc))
      assert(c3 <= c1, s"doc $doc canonical rose $c1 -> $c3")
    // ... and only for docs whose component a batch pair TOUCHED: the
    // changed set is contained in the components reachable from the
    // fold inputs' nodes (everything else passes through by identity)
    val touchedNodes = (p2.collect() ++ p3.collect())
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    val touchedComponents = day1.collect {
      case (doc, c) if touchedNodes.contains(doc) => c
    }.toSet
    for ((doc, c1) <- day1; c3 <- day3.get(doc) if c3 != c1)
      assert(touchedComponents.contains(c1),
        s"doc $doc changed canonical without its component being touched")
  }

  test("a fold with pairs among NEW docs only leaves every stored label untouched") {
    val store = tmpDir() + "/labelstore_iso"
    // stored corpus = slices 0-3; the batch's pairs are restricted to
    // batch-internal ones (no bridge to the store): stored labels must
    // pass through bit-identically, and batch clusters label among
    // themselves
    val prev = corpus.filter(col("doc_id") % 5 =!= 4)
    val batch = corpus.filter(col("doc_id") % 5 === 4)
    Dedup.corpusLabels(prev).write.mode("overwrite").parquet(store)
    val stored = labelMap(spark.read.parquet(store))
    val batchOnly = pairsOf(batch).localCheckpoint(true)
    val folded = labelMap(Dedup.incrementalLabelsOf(batchOnly, store))
    for ((doc, c) <- stored)
      assert(folded.get(doc).contains(c),
        s"stored doc $doc must keep canonical $c under a non-bridging fold")
    assert(labelMap(Dedup.corpusLabels(batch)).forall {
      case (doc, c) => folded.get(doc).contains(c)
    }, "batch-internal clusters must label among themselves")
  }
}
