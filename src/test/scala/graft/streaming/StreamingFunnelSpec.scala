package graft.streaming

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** funnelStream (the q41 streaming twin) — exactness under cross-batch
  * disorder, the property that distinguishes it from the in-order
  * contracts (scd2Stream) in this package.
  */
class StreamingFunnelSpec extends SparkTestBase {

  private def ts(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2026-01-01 $hhmm:00")

  private def lastDepths(table: String): Map[Long, Int] =
    spark.table(table).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
      .zipWithIndex
      .groupBy(_._1._1)
      .map { case (u, rs) => u -> rs.maxBy(_._2)._1._2 }

  test("late signup unlocks a chain that already streamed past") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[EventStreams.Event]
    val q = EventStreams.funnelStream(in.toDS())
      .writeStream.format("memory").queryName("funnel1")
      .outputMode("update").start()
    try {
      // the chain arrives first, unanchored: no signup yet
      in.addData(
        EventStreams.Event(2, ts("10:10"), 1, "view", 0.0),
        EventStreams.Event(3, ts("10:20"), 1, "click", 0.0),
        EventStreams.Event(4, ts("10:30"), 1, "purchase", 0.0))
      q.processAllAvailable()
      assert(lastDepths("funnel1")(1L) === 0)
      // the late signup sorts BEFORE all of them: full funnel
      in.addData(EventStreams.Event(1, ts("10:05"), 1, "signup", 0.0))
      q.processAllAvailable()
      assert(lastDepths("funnel1")(1L) === 4)
    } finally q.stop()
  }

  test("a signup after the chain does not count, a fresh chain after it does") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[EventStreams.Event]
    val q = EventStreams.funnelStream(in.toDS())
      .writeStream.format("memory").queryName("funnel2")
      .outputMode("update").start()
    try {
      in.addData(
        EventStreams.Event(1, ts("10:10"), 7, "view", 0.0),
        EventStreams.Event(2, ts("10:40"), 7, "signup", 0.0))
      q.processAllAvailable()
      assert(lastDepths("funnel2")(7L) === 1, "signup alone = stage 1")
      in.addData(EventStreams.Event(3, ts("10:50"), 7, "view", 0.0))
      q.processAllAvailable()
      assert(lastDepths("funnel2")(7L) === 2, "view AFTER the signup advances")
    } finally q.stop()
  }

  test("TTL variant: aged chain entries survive, aged unanchored candidates evict") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[EventStreams.Event]
    val q = EventStreams.funnelStreamTTL(in.toDS(), horizonMinutes = 60)
      .writeStream.format("memory").queryName("funnelTTL1")
      .outputMode("update").start()
    try {
      // u9 anchors a 2-deep chain; u5 holds an unanchored view
      in.addData(
        EventStreams.Event(1, ts("10:00"), 9, "signup", 0.0),
        EventStreams.Event(2, ts("10:10"), 9, "view", 0.0),
        EventStreams.Event(3, ts("10:05"), 5, "view", 0.0))
      q.processAllAvailable()
      assert(lastDepths("funnelTTL1")(9L) === 2)
      assert(lastDepths("funnelTTL1")(5L) === 0)
      // a non-funnel event 10 h later advances the watermark far past
      // both users' horizon
      in.addData(EventStreams.Event(4, ts("20:00"), 8, "error", 0.0))
      q.processAllAvailable()
      // u9's CHOSEN chain must survive aging: a fresh click continues
      // the funnel from the year-old anchor, exactly like the batch twin
      in.addData(
        EventStreams.Event(5, ts("20:30"), 9, "click", 0.0),
        // u5's aged unanchored view is gone; only the fresh chain counts
        EventStreams.Event(6, ts("20:10"), 5, "signup", 0.0),
        EventStreams.Event(7, ts("20:20"), 5, "view", 0.0))
      q.processAllAvailable()
      assert(lastDepths("funnelTTL1")(9L) === 3,
        "aged chain anchor must still unlock later stages")
      assert(lastDepths("funnelTTL1")(5L) === 2,
        "fresh chain after eviction counts from scratch")
    } finally q.stop()
  }

  test("TTL variant with a horizon wider than the stream equals the exact variant") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val events = graft.core.Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value").collect()
      .map(r => EventStreams.Event(r.getLong(0), r.getTimestamp(1),
        r.getLong(2), r.getString(3), r.getDouble(4)))
    val shuffled = events.sortBy(e => (e.event_id % 7, -e.event_id))
    val in = MemoryStream[EventStreams.Event]
    // horizon far beyond the dataset's time span: nothing is ever late,
    // nothing ever evicts — must reproduce the batch answer exactly
    val q = EventStreams.funnelStreamTTL(in.toDS(),
        horizonMinutes = 10L * 365 * 24 * 60)
      .writeStream.format("memory").queryName("funnelTTL2")
      .outputMode("update").start()
    try {
      shuffled.grouped(shuffled.length / 5 + 1).foreach { batch =>
        in.addData(batch.toSeq)
        q.processAllAvailable()
      }
      val expected = graft.SparkEntry.queries("q41_funnel_pattern")(spark, sf)
        .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
      assert(lastDepths("funnelTTL2") === expected,
        "wide-horizon TTL stream must equal the batch regex stages")
    } finally q.stop()
  }

  test("stream over shuffled sf0.001 events equals the batch q41 stages") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val events = graft.core.Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value").collect()
      .map(r => EventStreams.Event(r.getLong(0), r.getTimestamp(1),
        r.getLong(2), r.getString(3), r.getDouble(4)))
    // adversarial arrival order: nothing to do with event time
    val shuffled = events.sortBy(e => (e.event_id % 7, -e.event_id))
    val in = MemoryStream[EventStreams.Event]
    val q = EventStreams.funnelStream(in.toDS())
      .writeStream.format("memory").queryName("funnel3")
      .outputMode("update").start()
    try {
      shuffled.grouped(shuffled.length / 5 + 1).foreach { batch =>
        in.addData(batch.toSeq)
        q.processAllAvailable()
      }
      val expected = graft.SparkEntry.queries("q41_funnel_pattern")(spark, sf)
        .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
      assert(lastDepths("funnel3") === expected,
        "stream depth under disorder must equal the batch regex stages")
    } finally q.stop()
  }
}
