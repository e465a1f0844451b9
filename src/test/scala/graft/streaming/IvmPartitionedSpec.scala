package graft.streaming

import graft.SparkTestBase
import graft.compendium.Warehouse
import org.apache.spark.sql.functions._

/** The FS-level contract of the partition-granular IVM path (the round-13
  * verdict's one `weak` grade, closed): an epoch whose batch touches k
  * base buckets and m view buckets rewrites ONLY those k + m partition
  * directories — every other partition's files stay byte-identical on
  * disk — and the maintained view still equals the from-scratch recompute
  * of the just-updated base after every epoch. c15 drives the same path
  * through the driver's oracle gate; this spec pins what the hash gate
  * cannot see: WHERE the writes landed.
  */
class IvmPartitionedSpec extends SparkTestBase {
  import spark.implicits._

  private val B = 16

  private def partFiles(root: String, table: String, dir: String) = {
    val p = new org.apache.hadoop.fs.Path(s"$root/$table/$dir")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else {
      val it = fs.listFiles(p, true)
      val b = Seq.newBuilder[(String, Long, Long)]
      while (it.hasNext) {
        val f = it.next()
        if (!f.getPath.getName.startsWith("_"))
          b += ((f.getPath.toString, f.getLen, f.getModificationTime))
      }
      b.result().sortBy(_._1)
    }
  }

  /** 64 keys across all 16 pk buckets; ck = k mod 8 spreads the view
    * across 8 pck buckets.
    */
  private def seedStore(root: String): Warehouse = {
    val wh = new Warehouse(spark, root)
    val base = (0L until 64L).map(k => (k, 0L, "I", k % 8, k * 10))
      .toDF("k", "seq", "op", "ck", "cents")
    EventStreams.applyIvmBatchPartitioned(base, wh, "base", "view",
      epoch = 0L, queryId = "seed", buckets = B)
    wh
  }

  private def recompute(wh: Warehouse) =
    wh.read("base").groupBy("ck")
      .agg(count(lit(1)).as("n"), sum("cents").as("cents_total"))
      .select("ck", "n", "cents_total").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq

  private def viewRows(wh: Warehouse) =
    wh.read("view").select("ck", "n", "cents_total").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq

  test("an epoch touching k buckets rewrites only those k (base AND view), untouched files byte-stable") {
    val root = tmpDir()
    val wh = seedStore(root)
    // batch: k=3 (pk 3, old ck 3) moves to ck 5; k=19 (pk 3, ck 3)
    // updates in place; k=70 (pk 6) is a fresh insert at ck 2.
    // touched base buckets: {3, 6}; touched view buckets: {3, 5, 2}.
    val batch = Seq(
      (3L, 1L, "U", 5L, 999L),
      (19L, 1L, "U", 3L, 555L),
      (70L, 1L, "I", 2L, 777L))
      .toDF("k", "seq", "op", "ck", "cents")
    val baseBefore = (0 until B).map(p => p -> partFiles(root, "base", s"pk=$p"))
    val viewBefore = (0 until 8).map(p => p -> partFiles(root, "view", s"pck=$p"))
    EventStreams.applyIvmBatchPartitioned(batch, wh, "base", "view",
      epoch = 1L, queryId = "seed", buckets = B)
    val touchedPk = Set(3, 6)
    val touchedPck = Set(2, 3, 5)
    baseBefore.foreach { case (p, files) =>
      if (touchedPk(p))
        assert(partFiles(root, "base", s"pk=$p") !== files,
          s"base pk=$p holds the batch's keys — it must have been rewritten")
      else
        assert(partFiles(root, "base", s"pk=$p") === files,
          s"base pk=$p was not touched by the batch — its files must not move")
    }
    viewBefore.foreach { case (p, files) =>
      if (touchedPck(p))
        assert(partFiles(root, "view", s"pck=$p") !== files,
          s"view pck=$p holds affected groups — it must have been rewritten")
      else
        assert(partFiles(root, "view", s"pck=$p") === files,
          s"view pck=$p was not touched by the batch — its files must not move")
    }
    assert(viewRows(wh) === recompute(wh),
      "after the epoch, view must equal the from-scratch recompute")
  }

  test("partitioned path equals the flat path on the maintained view, epoch by epoch") {
    val rootP = tmpDir(); val rootF = tmpDir()
    val whP = seedStore(rootP)
    val whF = new Warehouse(spark, rootF)
    whF.replace("base",
      (0L until 64L).map(k => (k, k % 8, k * 10)).toDF("k", "ck", "cents"))
    val epochs = Seq(
      Seq((3L, 1L, "U", 5L, 999L), (70L, 1L, "I", 2L, 777L)),
      Seq((3L, 2L, "D", 5L, 0L), (19L, 1L, "U", 7L, 123L)),
      Seq((70L, 2L, "U", 2L, 778L)))
    epochs.zipWithIndex.foreach { case (rows, i) =>
      val b = rows.toDF("k", "seq", "op", "ck", "cents")
      EventStreams.applyIvmBatchPartitioned(b, whP, "base", "view",
        epoch = i + 1L, queryId = "seed", buckets = B)
      EventStreams.applyIvmBatch(b, whF, "base", "view",
        epoch = i.toLong, queryId = "flat")
      assert(viewRows(whP) === whF.read("view")
        .select("ck", "n", "cents_total").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq,
        s"epoch ${i + 1}: partitioned view must equal the flat view")
      assert(viewRows(whP) === recompute(whP),
        s"epoch ${i + 1}: view must equal the base recompute")
    }
  }

  test("a batch that empties a view partition sweeps it (no group resurrection)") {
    val root = tmpDir()
    val wh = new Warehouse(spark, root)
    // one key per ck: deleting k=5 (ck 5) empties view bucket pck=5
    EventStreams.applyIvmBatchPartitioned(
      (0L until 8L).map(k => (k, 0L, "I", k, k * 10))
        .toDF("k", "seq", "op", "ck", "cents"),
      wh, "base", "view", epoch = 0L, queryId = "seed", buckets = B)
    EventStreams.applyIvmBatchPartitioned(
      Seq((5L, 1L, "D", 5L, 0L)).toDF("k", "seq", "op", "ck", "cents"),
      wh, "base", "view", epoch = 1L, queryId = "seed", buckets = B)
    assert(partFiles(root, "view", "pck=5").isEmpty,
      "an emptied view partition's old files would resurrect the dropped group")
    assert(viewRows(wh).map(_._1) === (0L until 8L).filterNot(_ == 5L))
    assert(viewRows(wh) === recompute(wh))
  }

  test("view bootstrap from a pre-existing partitioned base is the full aggregate") {
    val root = tmpDir()
    val wh = new Warehouse(spark, root)
    wh.applyCdcPartitioned("base",
      (0L until 64L).map(k => (k, 0L, "I", k % 8, k * 10))
        .toDF("k", "seq", "op", "ck", "cents"),
      "k", "seq", "op", "pk", c => pmod(c, lit(B.toLong)))
    // first streamed batch against a base that predates the view: the
    // bootstrap must seed from the FULL base aggregate, then apply the
    // delta — not start from empty (the flat path's round-12 defect)
    EventStreams.applyIvmBatchPartitioned(
      Seq((3L, 1L, "U", 5L, 999L)).toDF("k", "seq", "op", "ck", "cents"),
      wh, "base", "view", epoch = 0L, queryId = "boot", buckets = B)
    assert(viewRows(wh) === recompute(wh),
      "bootstrap view must cover every pre-existing group, not just the batch's")
  }

  test("the pruned-read shape carries PartitionFilters — directory pruning, not row filtering") {
    // the epoch apply builds read(table).filter(pk isin touched); this
    // pins that THAT shape resolves to plan-time partition pruning (a
    // PartitionFilters entry on the scan, zero data filters) — if the
    // filter ever drifted to a derived expression (pmod(k, n) instead of
    // the stored pk column), pruning would silently vanish while every
    // row-level result stayed correct
    val root = tmpDir()
    seedStore(root)
    val wh = new Warehouse(spark, root)
    val pruned = wh.read("base").filter(col("pk").isin(3L, 6L))
    pruned.collect()
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), plan.take(1200))
    val pf = plan.linesIterator.find(_.contains("PartitionFilters"))
      .getOrElse("")
    assert(pf.contains("pk"), s"partition filter must bind the pk column: $pf")
    // and the scan's own pruning metric confirms it read TWO directories
    // (inputFiles would lie here — it lists the un-pruned relation)
    val scan = pruned.queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.get
    assert(scan.metrics("numPartitions").value === 2L,
      s"scan must read exactly the 2 touched partitions, " +
        s"got ${scan.metrics("numPartitions").value}")
  }

  test("compactEvery: a hot partition's per-epoch file accretion is bounded by auto-maintenance, rows preserved") {
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = tmpDir()
    val wh = new Warehouse(spark, root)
    val in = MemoryStream[EventStreams.CdcViewChange]
    // every epoch updates the SAME key (k=3 -> pk 3, ck 3 -> pck 3):
    // the hot-partition shape — one new file in pk=3 and pck=3 per epoch
    val q = EventStreams.ivmStreamPartitioned(in.toDS(), wh, "base", "view",
        buckets = B, compactEvery = 3).start()
    try {
      (0 until 6).foreach { i =>
        in.addData(EventStreams.CdcViewChange(3L, i.toLong, "U", 3L, 100L + i))
        q.processAllAvailable()
      }
    } finally q.stop()
    // 6 epochs at compactEvery=3 -> maintenance ran at epochs 2 and 5;
    // a tiny partition's byte-justified count is ONE file, so the hot
    // dirs must hold 1 file each, not 6
    assert(partFiles(root, "base", "pk=3").size === 1,
      "auto-compaction must bound the hot base partition's file count")
    assert(partFiles(root, "view", "pck=3").size === 1,
      "auto-compaction must bound the hot view partition's file count")
    assert(viewRows(wh) === Seq((3L, 1L, 105L)), "last update wins")
    assert(viewRows(wh) === recompute(wh))
  }

  test("replay of an already-applied epoch is skipped; a legacy epoch-only marker migrates instead of throwing") {
    val root = tmpDir()
    val wh = seedStore(root)
    val batch = Seq((3L, 1L, "U", 5L, 999L))
      .toDF("k", "seq", "op", "ck", "cents")
    EventStreams.applyIvmBatchPartitioned(batch, wh, "base", "view",
      epoch = 1L, queryId = "seed", buckets = B)
    val after = viewRows(wh)
    // same (queryId, epoch) redelivery: deltas are not idempotent, so a
    // re-apply would double-count — must skip
    EventStreams.applyIvmBatchPartitioned(batch, wh, "base", "view",
      epoch = 1L, queryId = "seed", buckets = B)
    assert(viewRows(wh) === after, "replayed epoch must be a no-op")
    // legacy marker (epoch-only, pre-queryId schema): the next batch must
    // interpret it with epoch-only semantics, not throw on the missing
    // column (the upgrade-in-place contract)
    wh.replace("view__epoch", Seq(1L).toDF("epoch").coalesce(1))
    EventStreams.applyIvmBatchPartitioned(
      Seq((19L, 1L, "U", 3L, 555L)).toDF("k", "seq", "op", "ck", "cents"),
      wh, "base", "view", epoch = 2L, queryId = "whatever", buckets = B)
    assert(viewRows(wh) === recompute(wh),
      "post-legacy-marker batch must apply and the marker must upgrade")
    assert(wh.read("view__epoch").columns.contains("query_id"),
      "the applied batch rewrites the marker in the new schema")
    // the migrated floor must EXPIRE with that rewrite: a later fresh
    // lineage restarting epochs at 0 is new work — a persisted floor
    // would silently skip its first batches forever (unbounded CDC loss)
    EventStreams.applyIvmBatchPartitioned(
      Seq((23L, 1L, "U", 7L, 444L)).toDF("k", "seq", "op", "ck", "cents"),
      wh, "base", "view", epoch = 0L, queryId = "fresh-after-legacy",
      buckets = B)
    assert(viewRows(wh) === recompute(wh),
      "view/base diverged after the post-migration fresh-lineage epoch")
    // the non-vacuous half: the batch actually LANDED (a skip would
    // leave view == recompute trivially, with the row missing from both)
    assert(wh.read("base").filter(col("k") === 23L &&
      col("cents") === 444L).count() === 1L,
      "a fresh lineage's epoch 0 was refused by a permanently-persisted legacy floor")
  }

  test("zombie lineage after takeover: the predecessor's redelivered epoch stays refused on the partitioned path") {
    val root = tmpDir()
    val wh = seedStore(root)
    val aBatch = Seq((3L, 1L, "U", 5L, 999L))
      .toDF("k", "seq", "op", "ck", "cents")
    // lineage A applies epoch 1, then lineage B takes over from a fresh
    // checkpoint (its epoch 0 is new work and must apply)
    EventStreams.applyIvmBatchPartitioned(aBatch, wh, "base", "view",
      epoch = 1L, queryId = "lineage-a", buckets = B)
    EventStreams.applyIvmBatchPartitioned(
      Seq((19L, 1L, "U", 3L, 555L)).toDF("k", "seq", "op", "ck", "cents"),
      wh, "base", "view", epoch = 0L, queryId = "lineage-b", buckets = B)
    val settled = viewRows(wh)
    assert(settled === recompute(wh))
    // ZOMBIE: A redelivers its epoch 1 after B's commit — the
    // per-lineage map must refuse the additive delta
    EventStreams.applyIvmBatchPartitioned(aBatch, wh, "base", "view",
      epoch = 1L, queryId = "lineage-a", buckets = B)
    assert(viewRows(wh) === settled,
      "zombie redelivery re-applied on the partitioned path")
    assert(viewRows(wh) === recompute(wh),
      "view/base diverged after the zombie redelivery")
  }
}
