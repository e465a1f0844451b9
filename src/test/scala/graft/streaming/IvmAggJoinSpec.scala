package graft.streaming

import graft.SparkTestBase
import graft.compendium.ManifestCommit
import org.apache.spark.sql.functions._

/** ivmAggJoinStream — AGGREGATE-over-join view maintenance under
  * two-sided CDC (c25). Pins, per change class, what the oracle hash
  * proves only in aggregate: the view equals the from-scratch
  * γ_ck(A ⟕ B) after EVERY epoch; a dim change re-weights the
  * aggregated row from the stored sufficient statistic; and — the
  * delta-rule claim itself — a dim-only epoch performs ZERO fact-store
  * I/O, proven by physically REMOVING the fact directories for the
  * epoch's duration: any listing or read would throw, any rewrite
  * would recreate them.
  */
class IvmAggJoinSpec extends SparkTestBase {
  import spark.implicits._

  private val B = 8

  private def ch(side: String, key: Long, seq: Long, op: String,
      ck: Long, amt: Long) =
    EventStreams.CdcJoinChange(side, key, seq, op, ck, amt)

  private def chDF(rows: Seq[EventStreams.CdcJoinChange]) = rows.toDF()

  /** A: 32 facts, ck = k mod 4 (cks 0..3); B: dims 0..2 — ck 3 is
    * REFERENCED BUT ABSENT (the null-fill setup), like IvmJoinSpec.
    */
  private def seed(mc: ManifestCommit): Unit = {
    val a = (0L until 32L).map(k => (k, k % 4, k * 10))
      .toDF("k", "ck", "cents")
    val b = (0L until 3L).map(ck => (ck, ck * 100 + 7))
      .toDF("ck", "rate")
    EventStreams.seedAggJoinView(mc, a, b, "a", "b", "v", B)
  }

  private type Row5 = (Long, Long, Long, Option[Long], Option[Long])

  private def rows5(df: org.apache.spark.sql.DataFrame): Seq[Row5] =
    df.select("ck", "n", "cents_total", "rate", "revenue_total").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
      .sortBy(_._1).toSeq

  private def viewRows(mc: ManifestCommit): Seq[Row5] = {
    val snap = mc.current()
    rows5(mc.readPartitionPathsAt(snap, "v", "pck",
      mc.partitionValues(snap, "v")).get)
  }

  private def recompute(mc: ManifestCommit): Seq[Row5] = {
    val snap = mc.current()
    def whole(t: String, pc: String) =
      mc.readPartitionPathsAt(snap, t, pc,
        mc.partitionValues(snap, t)).get
    rows5(whole("a", "pk").groupBy("ck")
      .agg(count(lit(1)).as("n"), sum("cents").as("cents_total"))
      .join(whole("b", "pbk").select("ck", "rate"), Seq("ck"), "left")
      .withColumn("revenue_total", col("cents_total") * col("rate")))
  }

  test("epoch by epoch: view == from-scratch aggregate of A left-join B, under every change class") {
    val mc = new ManifestCommit(spark, tmpDir())
    seed(mc)
    assert(viewRows(mc) === recompute(mc), "seed view must be the aggregate")
    // facts on the absent dim ck=3: rate and revenue NULL (sum over
    // all-NULL products), cents_total still real
    val g3 = viewRows(mc).find(_._1 == 3L).get
    assert(g3._4.isEmpty && g3._5.isEmpty && g3._3 > 0L)
    val epochs = Seq(
      // epoch 0: dim update (ck 1 re-weights), fact insert (new k=100
      // on ck 2), fact delete (k=4 retracts from ck 0)
      Seq(ch("B", 1, 1, "U", 1, 999), ch("A", 100, 1, "I", 2, 555),
        ch("A", 4, 1, "D", 0, 0)),
      // epoch 1: the NULL-FILL at aggregate grain — dim ck 3 INSERTS
      // (revenue materializes from the stored cents_total); plus a fact
      // re-key (k=5 moves ck 1 → ck 3: retract + add across groups)
      Seq(ch("B", 3, 1, "I", 3, 333), ch("A", 5, 1, "U", 3, 51)),
      // epoch 2: dim delete (ck 0's revenue nulls OUT, counts stay),
      // fact insert on a brand-new absent dim (group born with NULL
      // rate)
      Seq(ch("B", 0, 1, "D", 0, 0), ch("A", 101, 1, "I", 9, 777)))
    epochs.zipWithIndex.foreach { case (rows, i) =>
      EventStreams.applyIvmAggJoinBatch(chDF(rows), mc, "a", "b", "v",
        epoch = i.toLong, queryId = "q", buckets = B)
      assert(viewRows(mc) === recompute(mc),
        s"epoch $i: view diverged from the from-scratch aggregate")
    }
    val fin = viewRows(mc)
    // null-fill re-weight: ck 3 now has revenue = cents_total * 333
    val f3 = fin.find(_._1 == 3L).get
    assert(f3._4 === Some(333L) && f3._5 === Some(f3._3 * 333L),
      "dim insert must re-weight from the stored sufficient statistic")
    // null-out: ck 0 keeps its counts, loses its revenue
    val f0 = fin.find(_._1 == 0L).get
    assert(f0._4.isEmpty && f0._5.isEmpty && f0._2 > 0L)
    // re-weight: ck 1 revenue = cents_total * 999
    val f1 = fin.find(_._1 == 1L).get
    assert(f1._4 === Some(999L) && f1._5 === Some(f1._3 * 999L))
    // group born on an absent dim: counted, unpriced
    val f9 = fin.find(_._1 == 9L).get
    assert(f9._2 === 1L && f9._3 === 777L && f9._5.isEmpty)
    // replay: redelivered epoch is a no-op
    val v0 = mc.currentVersion()
    EventStreams.applyIvmAggJoinBatch(chDF(epochs.last), mc, "a", "b", "v",
      epoch = 2L, queryId = "q", buckets = B)
    assert(mc.currentVersion() === v0 && viewRows(mc) === fin,
      "redelivered epoch must be refused")
  }

  test("a dim-only epoch performs zero fact-store I/O: the A directories are ABSENT while it runs") {
    val root = tmpDir()
    val mc = new ManifestCommit(spark, root)
    seed(mc)
    val before = mc.current()
    val aKeys = mc.partitionKeys(before, "a")
    assert(aKeys.nonEmpty)
    // physically remove every fact directory's staging parent: if the
    // epoch lists, reads, or rewrites ANY a/pk=* path it throws or
    // recreates it — stronger than a bytes-read counter, which cannot
    // attribute I/O to a table
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the hiding name must NOT match the staged-dir grammar
    // (`.+__v\d+_[0-9a-f]+`), or the epoch's commit-time GC would sweep
    // the "orphan" — the `.hidden` suffix breaks the full-string match
    val aParents = aKeys.map(k => before(k).split('/').head).distinct
    aParents.foreach { p =>
      assert(fs.rename(new org.apache.hadoop.fs.Path(s"$root/$p"),
        new org.apache.hadoop.fs.Path(s"$root/$p.hidden")))
    }
    try {
      EventStreams.applyIvmAggJoinBatch(
        chDF(Seq(ch("B", 2, 1, "U", 2, 2222))), mc, "a", "b", "v",
        epoch = 0L, queryId = "q", buckets = B)
    } finally aParents.foreach { p =>
      assert(fs.rename(new org.apache.hadoop.fs.Path(s"$root/$p.hidden"),
        new org.apache.hadoop.fs.Path(s"$root/$p")))
    }
    val after = mc.current()
    // the fact table's manifest entries carried forward untouched
    aKeys.foreach(k => assert(before(k) === after(k),
      s"$k rewritten by a dim-only epoch"))
    // the re-weight landed: ck 2's revenue tracks the new rate, view ==
    // from-scratch on the restored trio
    val f2 = viewRows(mc).find(_._1 == 2L).get
    assert(f2._4 === Some(2222L) && f2._5 === Some(f2._3 * 2222L))
    assert(viewRows(mc) === recompute(mc))
    // and only the touched (b, v) partitions rewrote
    val touched = Set("b/pbk=2", "v/pck=2")
    (mc.partitionKeys(before, "b") ++ mc.partitionKeys(before, "v"))
      .filterNot(touched).foreach { k =>
        assert(before(k) === after(k), s"$k rewritten, never touched")
      }
    touched.foreach(k => assert(before(k) !== after(k), s"$k not rewritten"))
  }

  test("an unseeded pre-existing base bootstraps γ(A)⟕B once — retractions and untouched groups survive") {
    val mc = new ManifestCommit(spark, tmpDir())
    // (A, B) live, no view: pre-fix, the empty-frame fallback made a
    // retraction vanish through filter(n > 0) and every untouched
    // pre-existing group never materialize
    val a = (0L until 32L).map(k => (k, k % 4, k * 10))
      .toDF("k", "ck", "cents")
    val b = (0L until 3L).map(ck => (ck, ck * 100 + 7))
      .toDF("ck", "rate")
    val nb = lit(B.toLong)
    mc.commitPartitioned(Map(
      "a" -> (("pk", a.withColumn("pk", pmod(col("k"), nb)),
        (0L until B).toSeq)),
      "b" -> (("pbk", b.withColumn("pbk", pmod(col("ck"), nb)),
        (0L until B).toSeq)))): Unit
    // first CDC epoch WITHOUT seedAggJoinView: a fact DELETE (retracts
    // from a pre-existing group) + a dim re-rate — both demand the
    // pre-existing aggregate exist
    EventStreams.applyIvmAggJoinBatch(
      chDF(Seq(ch("A", 4, 1, "D", 0, 0), ch("B", 1, 1, "U", 1, 999))),
      mc, "a", "b", "v", epoch = 0L, queryId = "q", buckets = B)
    val v0 = viewRows(mc)
    assert(v0.map(_._1).toSet === Set(0L, 1L, 2L, 3L),
      "bootstrap must materialize every pre-existing group")
    assert(v0 === recompute(mc),
      "bootstrapped view must equal the from-scratch aggregate")
    assert(v0.find(_._1 == 0L).get._2 === 7L,
      "the retraction must land on the bootstrapped count")
    // the NEXT epoch takes the normal pruned delta path
    EventStreams.applyIvmAggJoinBatch(
      chDF(Seq(ch("A", 200, 2, "I", 2, 1234))), mc, "a", "b", "v",
      epoch = 1L, queryId = "q", buckets = B)
    assert(viewRows(mc) === recompute(mc))
  }

  test("randomized two-sided CDC: 8 epochs of mixed churn, view == from-scratch aggregate after every epoch") {
    val mc = new ManifestCommit(spark, tmpDir())
    seed(mc)
    val rnd = new scala.util.Random(99L)
    var seq = 100L
    def nextSeq() = { seq += 1; seq }
    (0 until 8).foreach { epoch =>
      val nA = 1 + rnd.nextInt(6)
      val nB = 1 + rnd.nextInt(3)
      val aChanges = (0 until nA).map { _ =>
        val k = rnd.nextInt(40).toLong
        val op = Seq("I", "U", "D")(rnd.nextInt(3))
        ch("A", k, nextSeq(), op, rnd.nextInt(7).toLong, k * 1000 + epoch)
      }
      val bChanges = (0 until nB).map { _ =>
        val ck = rnd.nextInt(7).toLong
        val op = Seq("I", "U", "D")(rnd.nextInt(3))
        ch("B", ck, nextSeq(), op, ck, ck * 10 + epoch)
      }
      EventStreams.applyIvmAggJoinBatch(
        chDF(rnd.shuffle(aChanges ++ bChanges)), mc, "a", "b", "v",
        epoch = epoch.toLong, queryId = "fuzz", buckets = B)
      assert(viewRows(mc) === recompute(mc),
        s"fuzz epoch $epoch diverged (seed 99)")
      // structural: one row per live group, revenue always the product
      // of its own columns
      viewRows(mc).foreach { r =>
        assert(r._5 === r._4.map(_ * r._3),
          s"fuzz epoch $epoch: revenue_total drifted from cents_total × rate")
      }
    }
  }
}
