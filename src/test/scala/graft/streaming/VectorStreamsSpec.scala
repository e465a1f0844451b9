package graft.streaming

import graft.SparkTestBase
import graft.compendium.ManifestCommit
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** forgetIngest — continuous exactly-once erasure of the centroid
  * statistics store. The claims: streamed tombstone batches leave the
  * store BIT-EQUAL to a batch rebuild over the survivors (the s29
  * contract, continuously); a fully-erased cluster drops mid-stream; a
  * redelivered batch id is a provable no-op (the non-idempotent-fold
  * hazard the manifest marker exists for); and the (stats, marker)
  * pair is never torn (one manifest resolution sees them move
  * together).
  */
class VectorStreamsSpec extends SparkTestBase {

  private def vec(id: Long): Seq[Double] =
    (0 until 64).map(i => (id * 64 + i).toDouble / 1000.0)

  // members: label 0 = ids {0, 1, 3}, label 1 = ids {2, 16, 23, 37};
  // tombstones erase ALL of label 1 plus label 0's id 3
  private val members: Seq[(Long, Long)] = Seq(
    (0L, 0L), (1L, 0L), (3L, 0L), (2L, 1L), (16L, 1L), (23L, 1L), (37L, 1L))

  private def seedStats(root: String): Unit = {
    import spark.implicits._
    graft.plans.VectorExpressions.register(spark)
    val df = members.map { case (id, lab) => (lab, vec(id)) }
      .toDF("clabel", "v")
    VectorStreams.seed(spark,
      root, graft.operators.Similarity.centroidStats(df, "clabel"))
  }

  test("streamed tombstones ≡ batch rebuild over survivors; full cluster drops; marker tracks the high water") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val root = tmpDir()
    seedStats(root)
    val in = MemoryStream[VectorStreams.Tombstone]
    val q = VectorStreams.forgetIngest(in.toDS(), root)
      .option("checkpointLocation", s"$root/_ckpt").start()
    try {
      in.addData(VectorStreams.Tombstone(2L, vec(2L), 1L),
        VectorStreams.Tombstone(16L, vec(16L), 1L))
      q.processAllAvailable()
      in.addData(VectorStreams.Tombstone(23L, vec(23L), 1L),
        VectorStreams.Tombstone(37L, vec(37L), 1L),
        VectorStreams.Tombstone(3L, vec(3L), 0L))
      q.processAllAvailable()
    } finally q.stop()
    val mc = new ManifestCommit(spark, root)
    val cur = mc.current()
    // marker and stats resolve through ONE manifest — the pair is
    // consistent by construction, and the high water is batch 1
    assert(mc.readAt(cur, VectorStreams.MarkerTable)
      .select(max(col("batch_id"))).as[Long].head() === 1L)
    val got = mc.readAt(cur, VectorStreams.StatsTable)
    // label 1 fully erased → dropped; label 0 survives with ids {0, 1}
    val rebuild = graft.operators.Similarity.centroidStats(
      Seq((0L, vec(0L)), (0L, vec(1L))).toDF("clabel", "v"), "clabel")
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("clabel") +: col("cnt") +:
        (1 to 64).map(i => col(s"s_$i").cast("string").as(s"s_$i")): _*)
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    assert(canon(got) === canon(rebuild),
      "streamed decrement diverged from the batch rebuild")
  }

  test("redelivered batch id is a no-op: same version, same stats (the non-idempotent-fold guard)") {
    import spark.implicits._
    val root = tmpDir()
    seedStats(root)
    val b0 = Seq(VectorStreams.Tombstone(2L, vec(2L), 1L)).toDS()
    assert(VectorStreams.applyForgetBatch(b0, root, 0L),
      "first delivery must apply")
    val mc = new ManifestCommit(spark, root)
    val vAfter = mc.currentVersion().get
    val statsAfter = mc.read(VectorStreams.StatsTable)
      .select(col("clabel"), col("cnt")).collect().map(_.toSeq).toSet
    // checkpoint-recovery shape: the SAME batch id arrives again
    assert(!VectorStreams.applyForgetBatch(b0, root, 0L),
      "redelivery must be refused")
    assert(mc.currentVersion().get === vAfter, "no-op must not commit")
    assert(mc.read(VectorStreams.StatsTable)
      .select(col("clabel"), col("cnt")).collect().map(_.toSeq).toSet
      === statsAfter, "redelivery double-subtracted")
  }

  test("a NEW query lineage applies from batch 0 — a fresh checkpoint never silently drops erasures") {
    import spark.implicits._
    val root = tmpDir()
    seedStats(root)
    val sc = spark.sparkContext
    try {
      sc.setLocalProperty("sql.streaming.queryId", "lineage-a")
      assert(VectorStreams.applyForgetBatch(
        Seq(VectorStreams.Tombstone(2L, vec(2L), 1L)).toDS(), root, 0L))
      assert(!VectorStreams.applyForgetBatch(
        Seq(VectorStreams.Tombstone(2L, vec(2L), 1L)).toDS(), root, 0L),
        "same lineage, same id: must refuse")
      // failover: the restarted job gets a NEW query id and its batch
      // ids restart at 0 — an epoch-only marker would refuse this and
      // LOSE the erasure; the lineage-aware marker applies it
      sc.setLocalProperty("sql.streaming.queryId", "lineage-b")
      assert(VectorStreams.applyForgetBatch(
        Seq(VectorStreams.Tombstone(16L, vec(16L), 1L)).toDS(), root, 0L),
        "a new lineage's batch 0 must apply")
      val mc = new ManifestCommit(spark, root)
      val cnt1 = mc.read(VectorStreams.StatsTable)
        .filter(col("clabel") === 1L).select(col("cnt")).as[Long].head()
      assert(cnt1 === 2L, s"both lineages' erasures must land: cnt=$cnt1")
      // ZOMBIE lineage: A's driver resurfaces and redelivers ITS batch 0
      // after B took over — with a single latest-writer marker row, A's
      // guard would be gone and the decrement would double-apply; the
      // per-lineage high-water map must still refuse it
      sc.setLocalProperty("sql.streaming.queryId", "lineage-a")
      assert(!VectorStreams.applyForgetBatch(
        Seq(VectorStreams.Tombstone(2L, vec(2L), 1L)).toDS(), root, 0L),
        "a zombie lineage's redelivered batch must stay refused")
      assert(mc.read(VectorStreams.StatsTable)
        .filter(col("clabel") === 1L).select(col("cnt")).as[Long].head()
        === 2L, "zombie redelivery double-subtracted")
      // and an EMPTY batch neither applies nor burns a manifest version
      val vNow = mc.currentVersion().get
      assert(!VectorStreams.applyForgetBatch(
        Seq.empty[VectorStreams.Tombstone].toDS(), root, 99L),
        "empty batch must be a no-op")
      assert(mc.currentVersion().get === vNow,
        "empty batch committed a version")
    } finally sc.setLocalProperty("sql.streaming.queryId", null)
  }

  test("over-erasure and unknown clusters fail loudly on the validated streaming path") {
    import spark.implicits._
    val root = tmpDir()
    seedStats(root)
    // five DISTINCT ids claiming label 1 (which folded only 4 members):
    // count-grain over-erasure, the loud-failure case validate owns.
    // (A DUPLICATED id is no longer an error at all — the vec_id dedup
    // collapses it before the fold; see the idempotence tests below.)
    val five = Seq(2L, 16L, 23L, 37L, 99L)
      .map(id => VectorStreams.Tombstone(id, vec(id), 1L))
    val e1 = intercept[IllegalArgumentException] {
      VectorStreams.applyForgetBatch(five.toDS(), root, 0L)
    }
    assert(e1.getMessage.contains("over-erasure"), e1.getMessage)
    // a tombstone crediting a cluster the store never folded
    val e2 = intercept[IllegalArgumentException] {
      VectorStreams.applyForgetBatch(
        Seq(VectorStreams.Tombstone(2L, vec(2L), 77L)).toDS(), root, 1L)
    }
    assert(e2.getMessage.contains("unknown to the store"), e2.getMessage)
  }

  test("a vec_id repeated IN one batch decrements exactly once (intra-batch dedup)") {
    import spark.implicits._
    val root = tmpDir()
    seedStats(root)
    // id 2 arrives twice in the same micro-batch — the at-least-once
    // shape the marker cannot catch (one batch id). Without the dedup
    // the count survives (4 − 2 = 2 > 0) and ONLY the sums corrupt —
    // the silent case. The store must equal a rebuild over survivors
    // {16, 23, 37}, bit-equal, proving one subtraction happened.
    assert(VectorStreams.applyForgetBatch(
      Seq(VectorStreams.Tombstone(2L, vec(2L), 1L),
        VectorStreams.Tombstone(2L, vec(2L), 1L)).toDS(), root, 0L))
    val mc = new ManifestCommit(spark, root)
    val got = mc.read(VectorStreams.StatsTable).filter(col("clabel") === 1L)
    val rebuild = graft.operators.Similarity.centroidStats(
      Seq(16L, 23L, 37L).map(id => (1L, vec(id))).toDF("clabel", "v"),
      "clabel")
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("clabel") +: col("cnt") +:
        (1 to 64).map(i => col(s"s_$i").cast("string").as(s"s_$i")): _*)
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    assert(canon(got) === canon(rebuild),
      "duplicated tombstone double-subtracted inside one batch")
  }

  test("a vec_id re-sent under a NEW batch id (and a new lineage) is a provable no-op — the erased-segment guard") {
    import spark.implicits._
    val root = tmpDir()
    seedStats(root)
    val sc = spark.sparkContext
    try {
      sc.setLocalProperty("sql.streaming.queryId", "lineage-a")
      assert(VectorStreams.applyForgetBatch(
        Seq(VectorStreams.Tombstone(2L, vec(2L), 1L)).toDS(), root, 0L))
      // same id re-sent under a HIGHER batch id of the same lineage —
      // the marker passes it, the erased store must drop it; the fresh
      // id in the same batch must still land
      assert(VectorStreams.applyForgetBatch(
        Seq(VectorStreams.Tombstone(2L, vec(2L), 1L),
          VectorStreams.Tombstone(16L, vec(16L), 1L)).toDS(), root, 1L))
      val mc = new ManifestCommit(spark, root)
      val got = mc.read(VectorStreams.StatsTable)
        .filter(col("clabel") === 1L)
      val rebuild = graft.operators.Similarity.centroidStats(
        Seq(23L, 37L).map(id => (1L, vec(id))).toDF("clabel", "v"),
        "clabel")
      def canon(df: org.apache.spark.sql.DataFrame) = df
        .select(col("clabel") +: col("cnt") +:
          (1 to 64).map(i => col(s"s_$i").cast("string").as(s"s_$i")): _*)
        .collect().map(_.toSeq)
      assert(canon(got) === canon(rebuild),
        "cross-batch re-sent tombstone double-subtracted")
      // an ALL-already-erased batch from a brand-new lineage: nothing
      // fresh → refused outright, no manifest version burned
      sc.setLocalProperty("sql.streaming.queryId", "lineage-b")
      val vNow = mc.currentVersion().get
      assert(!VectorStreams.applyForgetBatch(
        Seq(VectorStreams.Tombstone(2L, vec(2L), 1L)).toDS(), root, 0L),
        "a fresh lineage re-feeding erased tombstones must no-op")
      assert(mc.currentVersion().get === vNow,
        "all-duplicate batch committed a version")
    } finally sc.setLocalProperty("sql.streaming.queryId", null)
  }

  test("erased segments stay bounded: the family compacts in one atomic flip and the guard survives it") {
    import spark.implicits._
    val root = tmpDir()
    graft.plans.VectorExpressions.register(spark)
    // a 12-member cluster so the compaction cadence (CompactSegs = 8) is
    // reachable one tombstone per batch without over-erasing
    val df = (100L to 111L).map(id => (0L, vec(id))).toDF("clabel", "v")
    VectorStreams.seed(spark, root,
      graft.operators.Similarity.centroidStats(df, "clabel"))
    val mc = new ManifestCommit(spark, root)
    def segCount = mc.current().keys
      .count(_.startsWith("forget_erased_seg_"))
    (0 until 7).foreach { i =>
      assert(VectorStreams.applyForgetBatch(
        Seq(VectorStreams.Tombstone(100L + i, vec(100L + i), 0L)).toDS(),
        root, i.toLong))
    }
    assert(segCount === 7, s"expected 7 append segments, got $segCount")
    // the 8th applied batch crosses the cadence: the whole family merges
    // into ONE segment and the old names leave the manifest in the same
    // atomic flip
    assert(VectorStreams.applyForgetBatch(
      Seq(VectorStreams.Tombstone(107L, vec(107L), 0L)).toDS(), root, 7L))
    assert(segCount === 1, s"compaction left $segCount segments")
    // the guard must survive the merge: a pre-compaction id re-sent
    // under a new batch id is still a provable no-op
    assert(!VectorStreams.applyForgetBatch(
      Seq(VectorStreams.Tombstone(100L, vec(100L), 0L)).toDS(), root, 8L),
      "erased id re-applied after compaction")
    // and a post-compaction append starts the family growing again
    assert(VectorStreams.applyForgetBatch(
      Seq(VectorStreams.Tombstone(108L, vec(108L), 0L)).toDS(), root, 9L))
    assert(segCount === 2, s"post-compaction append gave $segCount segments")
  }
}
