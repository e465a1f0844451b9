package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only: run named queries once (after the Bench warmups) with a
  * listener that records every Spark job's wall-clock, so per-query time
  * decomposes into its job sequence — the "where does the epoch go"
  * question the optimization guide (§1) says to answer before touching
  * anything. Not part of the driver contract.
  *
  * Output per query: total wall, job count, sum of job wall, and the
  * top jobs by duration with their call sites.
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.LocalFs(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      )
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same warmups as Bench so the profiled run is the steady-state leg
    try {
      spark.range(1000).selectExpr("sum(id)").collect()
      spark.range(1000).write.format("noop").mode("overwrite").save()
      graft.core.Tables.all.filterNot(_ == "events").foreach { t =>
        try graft.core.Tables.load(spark, sfDir, t).limit(1).collect()
        catch { case _: Throwable => () }
      }
      graft.core.Tables.events(spark, sfDir).limit(1).collect()
    } catch { case _: Throwable => () }
    Seq[(SparkSession, String) => Unit](
      graft.operators.Dedup.warmStores,
      graft.operators.Similarity.warmStores,
      graft.operators.TextAnalysis.warmStores,
      graft.operators.RelationalQueries.warmSeeds
    ).foreach { w => try w(spark, sfDir) catch { case _: Throwable => () } }

    final case class JobRec(id: Int, start: Long, var end: Long = -1L,
        var desc: String = "", var site: String = "", var nTasks: Int = 0,
        var taskMs: Long = 0L, var nStages: Int = 0)
    val jobs = new scala.collection.concurrent.TrieMap[Int, JobRec]()
    val stageJob = new scala.collection.concurrent.TrieMap[Int, Int]()
    var taskTimeMs = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val r = JobRec(js.jobId, js.time)
        r.desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        r.site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("")
        js.stageIds.foreach(sid => stageJob.put(sid, js.jobId))
        jobs.put(js.jobId, r): Unit
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        jobs.get(je.jobId).foreach(_.end = je.time)
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        taskTimeMs.addAndGet(sc.stageInfo.taskMetrics.executorRunTime)
        stageJob.get(sc.stageInfo.stageId).flatMap(jobs.get).foreach { j =>
          j.nTasks += sc.stageInfo.numTasks
          j.taskMs += sc.stageInfo.taskMetrics.executorRunTime
          j.nStages += 1
        }
      }
    }

    val repeats = sys.env.get("SPARK_GRAFT_PROFILE_REPEATS")
      .map(_.toInt).getOrElse(2)
    for (name <- args; rep <- 1 to repeats) {
      jobs.clear(); taskTimeMs.set(0L)
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      val done = jobs.values.toSeq.sortBy(_.start)
      val jobSum = done.filter(_.end > 0).map(j => j.end - j.start).sum / 1e3
      println(f"===== $name run$rep: wall ${wall}%.2f s, ${done.size} jobs, " +
        f"job-wall sum ${jobSum}%.2f s, executor task time ${taskTimeMs.get / 1e3}%.2f s =====")
      if (rep == repeats) {
        // gaps between consecutive jobs > 50 ms are driver-side time
        val sorted = done.filter(_.end > 0)
        var prevEnd = 0L
        sorted.foreach { j =>
          val gap = if (prevEnd == 0) 0 else j.start - prevEnd
          prevEnd = math.max(prevEnd, j.end)
          val mark = if (gap > 50) f"  <<gap ${gap / 1e3}%.2f s" else ""
          println(f"  job ${j.id}%4d ${(j.end - j.start) / 1e3}%7.3f s " +
            f"[${j.nStages}%2d st ${j.nTasks}%4d tk ${j.taskMs / 1e3}%6.2f s] " +
            f"${j.desc.take(45)} @${j.site.take(40)}$mark")
        }
      }
    }
    spark.stop()
  }
}
