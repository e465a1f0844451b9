package graft.operators

import graft.SparkTestBase
import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.{LogEvent, LoggerContext}
import org.apache.logging.log4j.core.appender.AbstractAppender
import org.apache.logging.log4j.core.config.Property

/** Registry-wide whole-stage-codegen health gate.
  *
  * When janino rejects a generated method (the 64 KB limit, a constant-pool
  * overflow), Spark falls back to INTERPRETED execution for that stage and
  * keeps going — correctness is untouched, so no spec fails, and the only
  * trace is a log WARN. That is exactly how m08/m11's per-element vector
  * centering ran interpreted for two rounds: CollapseProject inlined the
  * 16-term mean into every element, the norm and the join's null filter
  * re-inlined the array, and the O(d³) generated code crossed the method
  * limit (fixed by the one-node `graft_center` expression). At 100 TB an
  * interpreted hot-path projection is a silent multi-× regression.
  *
  * This spec turns the log into a gate: it attaches a log4j2 appender to
  * the root logger, materializes every registry query, and fails on any
  * "Whole-stage codegen disabled" WARN (WholeStageCodegenExec) or
  * "Failed to compile" ERROR (CodeGenerator) — with the offending query
  * named, since events are drained per query.
  */
class CodegenHealthSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private class Capture extends AbstractAppender(
      "graft-codegen-capture", null, null, false, Property.EMPTY_ARRAY) {
    val events = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    override def append(e: LogEvent): Unit = {
      val logger = e.getLoggerName
      lazy val msg = e.getMessage.getFormattedMessage
      if ((logger.endsWith("WholeStageCodegenExec") &&
            msg.contains("Whole-stage codegen disabled")) ||
          (logger.endsWith("CodeGenerator") &&
            msg.contains("Failed to compile")))
        events.add(s"$logger: ${msg.linesIterator.take(3).mkString(" | ").take(400)}")
    }
    def drain(): Seq[String] = {
      val out = Vector.newBuilder[String]
      var e = events.poll()
      while (e != null) { out += e; e = events.poll() }
      out.result()
    }
  }

  graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name stays inside whole-stage codegen (no janino fallback)") {
      val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
      val cfg = ctx.getConfiguration
      val cap = new Capture
      cap.start()
      cfg.getRootLogger.addAppender(cap, Level.WARN, null)
      ctx.updateLoggers()
      try {
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        val hits = cap.drain()
        assert(hits.isEmpty,
          s"$name dropped out of whole-stage codegen:\n${hits.mkString("\n")}")
      } finally {
        cfg.getRootLogger.removeAppender(cap.getName)
        cap.stop()
        ctx.updateLoggers()
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
    }
  }
}
