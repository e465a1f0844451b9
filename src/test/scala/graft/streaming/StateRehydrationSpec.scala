package graft.streaming

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

/** Demote/rehydrate ≡ continuous for the three stateful twins that
  * lacked it (sessionize, transitionStream, funnelStream) — the
  * retentionStream/X81s pattern ported per operator: phase 1 runs and
  * stops (its state store dies with it), the demote artifact is built
  * through the operator's public codec, phase 2 restarts SEEDED from it
  * and the union of the phases must equal one continuous run over the
  * same (shuffled) feed. Each test also carries the negative control:
  * the unseeded restart diverges in exactly the way the codec exists to
  * prevent.
  */
class StateRehydrationSpec extends SparkTestBase {

  private def ts(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2026-01-01 $hhmm:00")

  private def ev(id: Long, t: String, uid: Long, typ: String,
      v: Double = 0.0) = EventStreams.Event(id, ts(t), uid, typ, v)

  // ---------------------------------------------------------------- sessions

  private def sessionRows(table: String) = spark.table(table)
    .filter(col("user_id") >= 0).collect()
    .map(r => (r.getLong(0), r.getTimestamp(1).toString,
      r.getTimestamp(2).toString, r.getLong(3), r.getDouble(4))).toSet

  test("sessionize demote/rehydrate: an open session survives the restart and merges its continuation; unseeded splits it") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // u1's session spans the phase boundary (the rehydration case); u2
    // is settled-closed inside phase 1; u3 is new in phase 2
    val batch1 = Seq(ev(1, "10:00", 1, "click", 1.0),
      ev(2, "10:10", 1, "click", 2.0), ev(3, "09:00", 2, "view", 4.0))
    val batch2 = Seq(ev(4, "10:25", 1, "view", 8.0),
      ev(5, "12:00", 3, "click", 16.0))
    // flushes advance the watermark (negative uid: excluded from reads).
    // flush1 lands at 10:35 so the demote watermark (10:05) closes u2
    // (timeout 09:30) but still ADMITS u1's 10:25 continuation — a
    // later flush would watermark-drop it in the continuous run too
    val flush1 = ev(-1, "10:35", -9, "view")
    val flush2 = ev(-2, "15:00", -8, "view")

    def run(name: String, seed: Option[Seq[EventStreams.Session]],
        feed: Seq[Seq[EventStreams.Event]]) = {
      val in = MemoryStream[EventStreams.Event]
      val ds = seed match {
        case None => EventStreams.sessionize(in.toDS(), gapMinutes = 30)
        case Some(open) => EventStreams.sessionize(in.toDS(), 30, None,
          EventStreams.sessionStateFrom(open.toDS()))
      }
      val q = ds.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        feed.foreach { b => in.addData(b); q.processAllAvailable() }
        sessionRows(name)
      } finally q.stop()
    }

    val rnd = new scala.util.Random(11L)
    val cont = run("sess_cont", None, Seq(rnd.shuffle(batch1), Seq(flush1),
      rnd.shuffle(batch2), Seq(flush2)))
    val r1 = run("sess_p1", None, Seq(rnd.shuffle(batch1), Seq(flush1)))
    // phase 1 closed u2 only; u1's OPEN session is the demote artifact —
    // a Session row is a lossless SessionState encoding
    assert(r1 === Set((2L, "2026-01-01 09:00:00.0",
      "2026-01-01 09:00:00.0", 1L, 4.0)))
    val open = Seq(EventStreams.Session(1L, ts("10:00"), ts("10:10"),
      2L, 3.0))
    val r2 = run("sess_p2", Some(open),
      Seq(rnd.shuffle(batch2), Seq(flush2)))
    assert(r1.union(r2) === cont,
      "two-phase demote/rehydrate must equal the continuous run")
    // the load-bearing row: u1's continuation MERGED into the
    // rehydrated open session (3 events from 10:00)
    assert(r2.contains((1L, "2026-01-01 10:00:00.0",
      "2026-01-01 10:25:00.0", 3L, 11.0)))
    // negative control: unseeded restart splits u1's session in two
    val r3 = run("sess_p2_unseeded", None,
      Seq(rnd.shuffle(batch2), Seq(flush2)))
    assert(r3.contains((1L, "2026-01-01 10:25:00.0",
      "2026-01-01 10:25:00.0", 1L, 8.0)) && !(r1.union(r3) == cont),
      "without rehydration the spanning session splits — the divergence the codec prevents")
    // an idle rehydrated session still closes EXACTLY ONCE via its
    // re-armed timeout, with no phase-2 arrivals for the user at all
    val r4 = run("sess_p2_idle", Some(open), Seq(Seq(flush2)))
    assert(r4 === Set((1L, "2026-01-01 10:00:00.0",
      "2026-01-01 10:10:00.0", 2L, 3.0)),
      "a rehydrated-then-idle open session must close once and exactly once")
  }

  // -------------------------------------------------------------- transitions

  private def transRows(table: String) = spark.table(table)
    .filter(col("user_id") >= 0).collect()
    .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    .sortBy(_.toString()).toSeq

  test("transitionStream demote/rehydrate: the bridge frontier survives the restart; unseeded fabricates a chain break") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val batch1 = Seq(ev(1, "09:00", 1, "click"), ev(2, "09:30", 1, "view"),
      ev(3, "09:10", 2, "signup"))
    val batch2 = Seq(ev(4, "12:00", 1, "purchase"), ev(5, "12:10", 2, "view"))
    val flush1 = ev(-1, "13:00", -9, "view") // wm → 11:00: batch1 settles
    val flush2 = ev(-2, "17:00", -8, "view") // wm → 15:00: batch2 settles

    def run(name: String, seed: Option[Seq[EventStreams.Event]],
        feed: Seq[Seq[EventStreams.Event]]) = {
      val in = MemoryStream[EventStreams.Event]
      val ds = seed match {
        case None => EventStreams.transitionStream(in.toDS(), "2 hours")
        case Some(hist) => EventStreams.transitionStream(in.toDS(),
          "2 hours", EventStreams.transitionStateFrom(hist.toDS()))
      }
      val q = ds.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        feed.foreach { b => in.addData(b); q.processAllAvailable() }
        transRows(name)
      } finally q.stop()
    }

    val rnd = new scala.util.Random(13L)
    val cont = run("tr_cont", None, Seq(rnd.shuffle(batch1), Seq(flush1),
      rnd.shuffle(batch2), Seq(flush2)))
    val r1 = run("tr_p1", None, Seq(rnd.shuffle(batch1), Seq(flush1)))
    assert(r1 === Seq((1L, "click", "view")),
      "phase 1 must settle batch1's pairs")
    // demote at the phase-1 watermark: both users are settled (last
    // events 09:30 / 09:10 ≤ wm 11:00) — the codec rebuilds each bridge
    // from the event HISTORY (the emitted pairs carry no frontier)
    val r2 = run("tr_p2", Some(batch1),
      Seq(rnd.shuffle(batch2), Seq(flush2)))
    assert((r1 ++ r2).sortBy(_.toString()) === cont,
      "two-phase demote/rehydrate must equal the continuous run")
    // the load-bearing rows: cross-phase pairs exist only because the
    // bridges were rehydrated
    assert(r2.contains((1L, "view", "purchase")) &&
      r2.contains((2L, "signup", "view")))
    // negative control: unseeded restart loses both cross-phase pairs
    val r3 = run("tr_p2_unseeded", None,
      Seq(rnd.shuffle(batch2), Seq(flush2)))
    assert(r3.isEmpty && !((r1 ++ r3).sortBy(_.toString()) == cont),
      "without rehydration the cross-phase transitions vanish — a fabricated chain break")
  }

  // ------------------------------------------------------------------ funnel

  private def lastDepths(table: String): Map[Long, Int] =
    spark.table(table).filter(col("user_id") >= 0).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
      .zipWithIndex
      .groupBy(_._1._1)
      .map { case (u, rs) => u -> rs.maxBy(_._2)._1._2 }

  test("funnelStream demote/rehydrate: rebuilt candidate state preserves achieved depth AND late-unlock candidates; unseeded forgets both") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // u1 reaches depth 2 in phase 1 and completes in phase 2; u2 holds
    // an UNANCHORED view+click in phase 1 whose late signup arrives in
    // phase 2 (the late-unlock case: depth jumps 0 → 3 only if the
    // un-chosen candidates were demoted and rehydrated too)
    val batch1 = Seq(ev(1, "10:00", 1, "signup"), ev(2, "10:10", 1, "view"),
      ev(3, "10:20", 2, "view"), ev(4, "10:30", 2, "click"))
    val batch2 = Seq(ev(5, "11:00", 1, "click"), ev(6, "11:10", 1, "purchase"),
      ev(7, "10:05", 2, "signup"))

    def run(name: String, seed: Option[Seq[EventStreams.Event]],
        feed: Seq[Seq[EventStreams.Event]]) = {
      val in = MemoryStream[EventStreams.Event]
      val ds = seed match {
        case None => EventStreams.funnelStream(in.toDS())
        case Some(hist) => EventStreams.funnelStream(in.toDS(),
          EventStreams.funnelStateFrom(hist.toDS()))
      }
      val q = ds.writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      try {
        feed.foreach { b => in.addData(b); q.processAllAvailable() }
        lastDepths(name)
      } finally q.stop()
    }

    val rnd = new scala.util.Random(17L)
    val cont = run("fu_cont", None,
      Seq(rnd.shuffle(batch1), rnd.shuffle(batch2)))
    assert(cont === Map(1L -> 4, 2L -> 3))
    val r1 = run("fu_p1", None, Seq(rnd.shuffle(batch1)))
    assert(r1 === Map(1L -> 2, 2L -> 0))
    // demote/rehydrate from the event history: insert-all + prune is
    // batch-order-free, so the rebuilt state equals the continuous
    // query's — including u2's un-chosen view/click candidates
    val r2 = run("fu_p2", Some(batch1), Seq(rnd.shuffle(batch2)))
    assert(r2 === cont,
      "rehydrated restart must reach the continuous depths")
    // negative control: unseeded restart forgets u1's signup+view (the
    // achieved prefix collapses to an unanchored click+purchase, depth
    // 0) and u2's unanchored candidates (the signup alone is depth 1)
    val r3 = run("fu_p2_unseeded", None, Seq(rnd.shuffle(batch2)))
    assert(r3 === Map(1L -> 0, 2L -> 1),
      "without rehydration achieved depth and pending unlocks both vanish")
  }
}
