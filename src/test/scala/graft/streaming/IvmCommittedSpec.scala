package graft.streaming

import graft.SparkTestBase
import graft.compendium.{ManifestCommit, Warehouse}
import org.apache.spark.sql.functions._

/** The manifest-committed IVM epoch: same delta algebra as the flat path,
  * but (view, base, marker) flip in ONE ManifestCommit — so the flat
  * form's documented crash/visibility window (a reader catching the new
  * view over the old base between the two renames) is structurally
  * impossible, and the epoch needs no commit-order reasoning at all.
  */
class IvmCommittedSpec extends SparkTestBase {
  import spark.implicits._

  private def batchDF(rows: Seq[(Long, Long, String, Long, Long)]) =
    rows.toDF("k", "seq", "op", "ck", "cents")

  private def viewRows(df: org.apache.spark.sql.DataFrame) =
    df.select("ck", "n", "cents_total").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq

  private def recomputeOf(base: org.apache.spark.sql.DataFrame) =
    viewRows(base.groupBy("ck")
      .agg(count(lit(1)).as("n"), sum("cents").as("cents_total")))

  private val epochs = Seq(
    Seq((3L, 1L, "U", 5L, 999L), (70L, 1L, "I", 2L, 777L)),
    Seq((3L, 2L, "D", 5L, 0L), (19L, 1L, "U", 7L, 123L)),
    Seq((70L, 2L, "U", 2L, 778L)))

  test("epoch by epoch: view == recompute(base) through ONE manifest; equal to the flat path") {
    val mc = new ManifestCommit(spark, tmpDir())
    val whF = new Warehouse(spark, tmpDir())
    val seed = (0L until 64L).map(k => (k, 0L, "I", k % 8, k * 10))
    EventStreams.applyIvmBatchCommitted(batchDF(seed), mc, "base", "view",
      epoch = 0L, queryId = "q")
    EventStreams.applyIvmBatch(batchDF(seed).toDF(), whF, "base", "view",
      epoch = 0L, queryId = "q")
    epochs.zipWithIndex.foreach { case (rows, i) =>
      EventStreams.applyIvmBatchCommitted(batchDF(rows), mc, "base", "view",
        epoch = i + 1L, queryId = "q")
      EventStreams.applyIvmBatch(batchDF(rows), whF, "base", "view",
        epoch = i + 1L, queryId = "q")
      // consistency unit = one manifest resolution for BOTH tables
      val snap = mc.current()
      assert(viewRows(mc.readAt(snap, "view"))
        === recomputeOf(mc.readAt(snap, "base")),
        s"epoch ${i + 1}: view must equal the base recompute in one snapshot")
      assert(viewRows(mc.readAt(snap, "view")) === viewRows(whF.read("view")),
        s"epoch ${i + 1}: committed path must equal the flat path")
    }
  }

  test("a reader's snapshot taken mid-stream never mixes epochs — the flat path's torn window, closed") {
    val mc = new ManifestCommit(spark, tmpDir())
    EventStreams.applyIvmBatchCommitted(
      batchDF((0L until 64L).map(k => (k, 0L, "I", k % 8, k * 10))),
      mc, "base", "view", epoch = 0L, queryId = "q")
    // reader resolves between epochs; the writer commits epoch 1 between
    // the reader's VIEW read and its BASE read — with three independent
    // rename-swaps this is exactly the new-view/old-base interleaving
    val snap = mc.current()
    val viewBefore = viewRows(mc.readAt(snap, "view"))
    EventStreams.applyIvmBatchCommitted(batchDF(epochs.head), mc,
      "base", "view", epoch = 1L, queryId = "q")
    val baseThroughSnap = recomputeOf(mc.readAt(snap, "base"))
    assert(viewBefore === baseThroughSnap,
      "the pre-commit snapshot must pair the pre-epoch view with the pre-epoch base")
    // and the marker in that snapshot is the pre-epoch one
    assert(mc.readAt(snap, "view__epoch").head().getAs[Long]("epoch") === 0L)
    // a fresh resolution sees the whole post-epoch trio
    val fresh = mc.current()
    assert(viewRows(mc.readAt(fresh, "view"))
      === recomputeOf(mc.readAt(fresh, "base")))
    assert(mc.readAt(fresh, "view__epoch").head().getAs[Long]("epoch") === 1L)
  }

  test("replaying an already-applied epoch is a no-op (marker rides the same commit)") {
    val mc = new ManifestCommit(spark, tmpDir())
    EventStreams.applyIvmBatchCommitted(
      batchDF((0L until 16L).map(k => (k, 0L, "I", k % 4, k * 10))),
      mc, "base", "view", epoch = 0L, queryId = "q")
    val v0 = mc.currentVersion()
    EventStreams.applyIvmBatchCommitted(
      batchDF((0L until 16L).map(k => (k, 0L, "I", k % 4, k * 10))),
      mc, "base", "view", epoch = 0L, queryId = "q")
    assert(mc.currentVersion() === v0,
      "a replayed epoch must not even produce a new manifest version")
  }

  test("zombie lineage after takeover: the predecessor's redelivered epoch stays refused; the successor's new work applies") {
    val mc = new ManifestCommit(spark, tmpDir())
    val seed = (0L until 16L).map(k => (k, 0L, "I", k % 4, k * 10))
    // lineage A seeds and runs to epoch 1
    EventStreams.applyIvmBatchCommitted(batchDF(seed), mc, "base", "view",
      epoch = 0L, queryId = "lineage-a")
    EventStreams.applyIvmBatchCommitted(batchDF(epochs.head), mc,
      "base", "view", epoch = 1L, queryId = "lineage-a")
    // takeover: lineage B starts from a fresh checkpoint (epoch 0 = new
    // work) — must apply
    EventStreams.applyIvmBatchCommitted(batchDF(epochs(1)), mc,
      "base", "view", epoch = 0L, queryId = "lineage-b")
    val snap = mc.current()
    val settled = viewRows(mc.readAt(snap, "view"))
    assert(settled === recomputeOf(mc.readAt(snap, "base")))
    val vSettled = mc.currentVersion()
    // ZOMBIE: A's driver resurfaces and redelivers its epoch 1 — a
    // single latest-writer marker row (now owned by B) would re-apply
    // the additive delta; the per-lineage map must refuse it, without
    // even a manifest version
    EventStreams.applyIvmBatchCommitted(batchDF(epochs.head), mc,
      "base", "view", epoch = 1L, queryId = "lineage-a")
    assert(mc.currentVersion() === vSettled,
      "zombie redelivery burned a manifest version")
    assert(viewRows(mc.read("view")) === settled,
      "zombie redelivery re-applied an additive delta after takeover")
    // while A's NEXT epoch (2 > its high water 1) would be new work —
    // the map scopes refusal per lineage, not globally
    EventStreams.applyIvmBatchCommitted(batchDF(epochs(2)), mc,
      "base", "view", epoch = 2L, queryId = "lineage-a")
    val fin = mc.current()
    assert(viewRows(mc.readAt(fin, "view"))
      === recomputeOf(mc.readAt(fin, "base")),
      "post-zombie new epoch must still apply cleanly")
  }
}
