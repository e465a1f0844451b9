package graft.streaming

import graft.SparkTestBase
import graft.compendium.ManifestCommit
import org.apache.spark.sql.functions._

/** ivmJoinStream — LEFT-join view maintenance under two-sided CDC. The
  * claims the c24 oracle hash proves only in aggregate, pinned per
  * case: the view equals the from-scratch A ⟕ B after EVERY epoch
  * through one snapshot; a dim INSERT null-fills referencing fact rows
  * without a fact scan; a fact re-key moves its view row across
  * partitions; untouched partition directories stay byte-identical;
  * and the per-lineage replay marker refuses redeliveries and zombie
  * lineages like the rest of the family.
  */
class IvmJoinSpec extends SparkTestBase {
  import spark.implicits._

  private val B = 8

  private def ch(side: String, key: Long, seq: Long, op: String,
      ck: Long, amt: Long) =
    EventStreams.CdcJoinChange(side, key, seq, op, ck, amt)

  private def chDF(rows: Seq[EventStreams.CdcJoinChange]) = rows.toDF()

  /** A: 32 facts, ck = k mod 4 (cks 0..3); B: dims 0..2 — ck 3 is
    * REFERENCED BUT ABSENT (the null-fill setup).
    */
  private def seed(mc: ManifestCommit): Unit = {
    val a = (0L until 32L).map(k => (k, k % 4, k * 10))
      .toDF("k", "ck", "cents")
    val b = (0L until 3L).map(ck => (ck, ck * 100 + 7))
      .toDF("ck", "rate")
    EventStreams.seedJoinView(mc, a, b, "a", "b", "v", B)
  }

  private def viewRows(mc: ManifestCommit): Seq[(Long, Long, Long, Option[Long])] = {
    val snap = mc.current()
    mc.readPartitionPathsAt(snap, "v", "pck",
        mc.partitionKeys(snap, "v")
          .map(x => x.substring(x.indexOf('=') + 1).toLong)).get
      .select("k", "ck", "cents", "rate").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .sortBy(_._1).toSeq
  }

  private def recompute(mc: ManifestCommit): Seq[(Long, Long, Long, Option[Long])] = {
    val snap = mc.current()
    def whole(t: String, pc: String) =
      mc.readPartitionPathsAt(snap, t, pc,
        mc.partitionKeys(snap, t)
          .map(x => x.substring(x.indexOf('=') + 1).toLong)).get
    whole("a", "pk").select("k", "ck", "cents")
      .join(whole("b", "pbk").select("ck", "rate"), Seq("ck"), "left")
      .select("k", "ck", "cents", "rate").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .sortBy(_._1).toSeq
  }

  test("epoch by epoch: view == A left-join B recomputed through one snapshot, under every change class") {
    val mc = new ManifestCommit(spark, tmpDir())
    seed(mc)
    assert(viewRows(mc) === recompute(mc), "seed view must be the join")
    // facts referencing absent dim ck=3 start with rate null
    assert(viewRows(mc).filter(_._2 == 3L).forall(_._4.isEmpty))
    val epochs = Seq(
      // epoch 0: dim update (ck 1 re-rates), fact insert (new k=100 on
      // ck 2), fact delete (k=4)
      Seq(ch("B", 1, 1, "U", 1, 999), ch("A", 100, 1, "I", 2, 555),
        ch("A", 4, 1, "D", 0, 0)),
      // epoch 1: the NULL-FILL — dim ck 3 INSERTS; plus a fact re-key
      // (k=5 moves ck 1 → ck 3)
      Seq(ch("B", 3, 1, "I", 3, 333), ch("A", 5, 1, "U", 3, 51)),
      // epoch 2: dim delete (ck 0 — its facts' rates null OUT), fact
      // insert on a brand-new absent dim (ck 9)
      Seq(ch("B", 0, 1, "D", 0, 0), ch("A", 101, 1, "I", 9, 777)))
    epochs.zipWithIndex.foreach { case (rows, i) =>
      EventStreams.applyIvmJoinBatch(chDF(rows), mc, "a", "b", "v",
        epoch = i.toLong, queryId = "q", buckets = B)
      assert(viewRows(mc) === recompute(mc),
        s"epoch $i: view diverged from the from-scratch join")
    }
    val finRows = viewRows(mc)
    // null-fill: every ck-3 fact (incl. the re-keyed k=5) now carries 333
    assert(finRows.filter(_._2 == 3L).nonEmpty &&
      finRows.filter(_._2 == 3L).forall(_._4 === Some(333L)),
      "dim insert must fill rates of pre-existing referencing facts")
    // null-out: ck-0 facts lost their dim
    assert(finRows.filter(_._2 == 0L).forall(_._4.isEmpty),
      "dim delete must null referencing facts' rates")
    // re-rate: ck-1 facts carry the updated rate
    assert(finRows.filter(_._2 == 1L).forall(_._4 === Some(999L)))
    // re-key: k=5 lives under ck 3 now, exactly once
    assert(finRows.count(_._1 == 5L) === 1 &&
      finRows.find(_._1 == 5L).get._2 === 3L)
    // deletes and inserts landed
    assert(!finRows.exists(_._1 == 4L))
    assert(finRows.find(_._1 == 101L).get._4.isEmpty,
      "a fact on an absent dim enters with a null rate")
  }

  test("an epoch touching few keys leaves every untouched partition directory byte-identical across all three tables") {
    val root = tmpDir()
    val mc = new ManifestCommit(spark, root)
    seed(mc)
    val before = mc.current()
    def files(manifest: Map[String, String], key: String) = {
      val p = new org.apache.hadoop.fs.Path(s"$root/${manifest(key)}")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(p, true)
      val b = Seq.newBuilder[(String, Long, Long)]
      while (it.hasNext) {
        val f = it.next()
        if (!f.getPath.getName.startsWith("_"))
          b += ((f.getPath.toString, f.getLen, f.getModificationTime))
      }
      b.result().sortBy(_._1)
    }
    // one fact update on k=9 (pk 1, ck stays 1 → pck 1); one dim update
    // on ck 2 (pbk 2, pck 2)
    EventStreams.applyIvmJoinBatch(
      chDF(Seq(ch("A", 9, 1, "U", 1, 91), ch("B", 2, 1, "U", 2, 222))),
      mc, "a", "b", "v", epoch = 0L, queryId = "q", buckets = B)
    val after = mc.current()
    val touched = Set("a/pk=1", "b/pbk=2", "v/pck=1", "v/pck=2")
    (mc.partitionKeys(before, "a") ++ mc.partitionKeys(before, "b") ++
      mc.partitionKeys(before, "v")).filterNot(touched).foreach { k =>
      assert(before(k) === after(k), s"$k remapped by an epoch that never touched it")
      assert(files(before, k) === files(after, k), s"$k files changed")
    }
    touched.foreach(k => assert(before(k) !== after(k), s"$k not rewritten"))
    assert(viewRows(mc) === recompute(mc))
  }

  test("randomized two-sided CDC: 8 epochs of mixed fact/dim churn, view == from-scratch join after every epoch") {
    // the fuzz the curated cases can't give: interleaved inserts,
    // re-inserts after deletes, repeated re-keys, dim flapping
    // (I → D → I on one ck), multiple changes to one key inside one
    // epoch (exercising the in-batch last-op resolution) — seeded, so a
    // failure replays
    val mc = new ManifestCommit(spark, tmpDir())
    seed(mc)
    val rnd = new scala.util.Random(77L)
    var seq = 100L
    def nextSeq() = { seq += 1; seq }
    (0 until 8).foreach { epoch =>
      val nA = 1 + rnd.nextInt(6)
      val nB = 1 + rnd.nextInt(3)
      val aChanges = (0 until nA).map { _ =>
        val k = rnd.nextInt(40).toLong
        val op = Seq("I", "U", "D")(rnd.nextInt(3))
        ch("A", k, nextSeq(), op, rnd.nextInt(7).toLong,
          k * 1000 + epoch)
      }
      val bChanges = (0 until nB).map { _ =>
        val ck = rnd.nextInt(7).toLong
        val op = Seq("I", "U", "D")(rnd.nextInt(3))
        ch("B", ck, nextSeq(), op, ck, ck * 10 + epoch)
      }
      EventStreams.applyIvmJoinBatch(
        chDF(rnd.shuffle(aChanges ++ bChanges)), mc, "a", "b", "v",
        epoch = epoch.toLong, queryId = "fuzz", buckets = B)
      assert(viewRows(mc) === recompute(mc),
        s"fuzz epoch $epoch diverged (seed 77)")
      // structural invariant: the view holds each fact key exactly once
      val ks = viewRows(mc).map(_._1)
      assert(ks.distinct.size === ks.size,
        s"fuzz epoch $epoch duplicated a fact key in the view")
    }
  }

  test("an unseeded pre-existing base bootstraps the view once — never silently drops pre-existing facts") {
    val mc = new ManifestCommit(spark, tmpDir())
    // a warehouse populated BEFORE IVM was enabled: (A, B) live, no
    // view table — the case the appliers must recompute once, not
    // mis-maintain (the pre-fix behavior: every untouched pre-existing
    // fact row missing from the view, forever)
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
    // first CDC epoch arrives WITHOUT seedJoinView: one fact update +
    // one dim update
    EventStreams.applyIvmJoinBatch(
      chDF(Seq(ch("A", 9, 1, "U", 1, 91), ch("B", 2, 1, "U", 2, 222))),
      mc, "a", "b", "v", epoch = 0L, queryId = "q", buckets = B)
    val v0 = viewRows(mc)
    assert(v0.size === 32,
      "bootstrap must materialize every pre-existing fact row")
    assert(v0 === recompute(mc),
      "bootstrapped view must equal the from-scratch join")
    // the NEXT epoch takes the normal pruned path on the now-live view
    EventStreams.applyIvmJoinBatch(
      chDF(Seq(ch("A", 4, 2, "D", 0, 0))), mc, "a", "b", "v",
      epoch = 1L, queryId = "q", buckets = B)
    assert(viewRows(mc) === recompute(mc))
    assert(!viewRows(mc).exists(_._1 == 4L))
  }

  test("replay and zombie lineages are refused; an applied epoch is exactly once") {
    val mc = new ManifestCommit(spark, tmpDir())
    seed(mc)
    val batch = Seq(ch("B", 1, 1, "U", 1, 999))
    EventStreams.applyIvmJoinBatch(chDF(batch), mc, "a", "b", "v",
      epoch = 0L, queryId = "lineage-a", buckets = B)
    val settled = viewRows(mc)
    val v0 = mc.currentVersion()
    // same-lineage redelivery
    EventStreams.applyIvmJoinBatch(chDF(batch), mc, "a", "b", "v",
      epoch = 0L, queryId = "lineage-a", buckets = B)
    assert(mc.currentVersion() === v0 && viewRows(mc) === settled,
      "redelivered epoch must be a no-op")
    // takeover applies new work; the zombie predecessor stays refused
    EventStreams.applyIvmJoinBatch(
      chDF(Seq(ch("A", 7, 1, "U", 3, 71))), mc, "a", "b", "v",
      epoch = 0L, queryId = "lineage-b", buckets = B)
    val afterB = viewRows(mc)
    EventStreams.applyIvmJoinBatch(chDF(batch), mc, "a", "b", "v",
      epoch = 0L, queryId = "lineage-a", buckets = B)
    assert(viewRows(mc) === afterB,
      "a zombie lineage's redelivered epoch re-applied after takeover")
    assert(viewRows(mc) === recompute(mc))
  }
}
