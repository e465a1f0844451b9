package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.core.LocalFs(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen/datasource paths so the first measured queries
    // aren't charged session startup: JIT + codegen compiler init, parquet
    // footer/file-index building per table, and the CSV/text reader class
    // loading the fixture queries hit first (alphabetical order puts c01
    // in front).
    try {
      spark.range(1000).selectExpr("sum(id)").collect()
      spark.range(1000).write.format("noop").mode("overwrite").save()
      graft.core.Tables.all.filterNot(_ == "events").foreach { t =>
        try graft.core.Tables.load(spark, sfDir, t).limit(1).collect()
        catch { case _: Throwable => () }
      }
      graft.core.Tables.events(spark, sfDir).limit(1).collect()
      spark.read.option("sep", "\t").option("header", "true")
        .csv("fixtures/summary.tsv").limit(1).collect()
      spark.read.text("fixtures/sources.txt").limit(1).collect()
    } catch { case _: Throwable => () }
    // Pre-build the once-per-JVM warehouse sidecars (StoreFixture) the
    // incremental/consume-only gates read, so every repeat of a
    // store-consuming query times the CONSUMER leg — the quantity the
    // gates document ("the store build is the producer's amortized
    // cost"). best_of >= 2 already hid the build in the discarded first
    // run; this makes best-of-1 sweeps (the sf1 decade leg) measure the
    // same thing: r11's best-of-1 sweep charged the full d09 CC build
    // to d19's single run (12.8 s vs sub-second warm, a phantom 1.6
    // scaling exponent). Each family is guarded separately — a failed
    // warm just falls back to first-consumer-builds.
    Seq[(SparkSession, String) => Unit](
      graft.operators.Dedup.warmStores,
      graft.operators.Similarity.warmStores,
      graft.operators.TextAnalysis.warmStores,
      graft.operators.RelationalQueries.warmSeeds
    ).foreach { w => try w(spark, sfDir) catch { case _: Throwable => () } }
    // Machine-load provenance: bench numbers at local[32] swing ±30% under
    // background load, so record the 1-min load average before and after —
    // a regression on a loaded machine is classifiable without a re-run.
    val loadBefore =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .getSystemLoadAverage
    // Local-iteration escape hatch (never set by the driver): bench only a
    // comma-separated subset of query names. The emitted JSON carries the
    // filter so a subset total is never mistaken for a full-sweep total.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    // Repeat count (default 2): local[32] sweeps swing ±30% with
    // background load, so each query runs `repeats` times back-to-back
    // and the headline per-query number is the BEST — the run least
    // polluted by transient load; every repeat is recorded alongside so
    // the spread itself stays auditable (BASELINE.md methodology note).
    val repeats = sys.env.get("SPARK_GRAFT_BENCH_REPEATS")
      .map(_.toInt).getOrElse(2).max(1)
    // Load adjudication (the r10 d21/d20/q31 incident: three 3-6x load
    // artifacts shipped in the round artifact and read as regressions):
    // a committed trailing-median file (tools/bench_trailing.json,
    // regenerated per round by tools/make_trailing.py from the closing
    // sweeps) gives each query a reference; a query whose best-of
    // exceeds 2x its trailing median (with a 0.3 s absolute slack so
    // sub-100 ms queries don't re-run over jitter) gets up to 2 EXTRA
    // repeats before the JSON is written. Every adjudication is
    // recorded in the `outliers` field — trailing, first best, final
    // best, extra-run count — so a number that STAYS slow after the
    // re-runs is an annotated genuine finding, never a silent artifact.
    // Queries absent from the file (new this round) are not adjudicated.
    val trailingFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_TRAILING",
      "tools/bench_trailing.json")
    val trailing: Map[String, Double] =
      try {
        val txt = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(trailingFile)))
        "\"([^\"]+)\"\\s*:\\s*([0-9.]+)".r.findAllMatchIn(txt)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      } catch { case _: Throwable => Map.empty }
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
        def runOnce(): (Double, Boolean) = {
          val t0 = System.nanoTime()
          // noop write, not count(): count() lets Catalyst elide each query's
          // final global sort, under-measuring the output stage; the noop
          // sink materializes every output row through the full plan.
          // A query that throws is RECORDED (the "errors" JSON field), never
          // swallowed — a crashed query must not read as a fast success.
          val ok =
            try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
            catch {
              case t: Throwable =>
                // Local-iteration escape hatch (never set by the driver):
                // surface WHY a query landed in `errors` without polluting
                // the driver's 2000-char stdout tail window.
                if (sys.env.contains("SPARK_GRAFT_BENCH_DEBUG"))
                  System.err.println(s"[bench-debug] $name failed: $t")
                false
            }
          val sec = (System.nanoTime() - t0) / 1e9
          // Session hygiene between runs: queries leave the CacheManager
          // empty (CacheHygieneSpec pins it), but intra-query eager
          // localCheckpoints live as RDD-level blocks the CacheManager never
          // sees, released only when GC + the async ContextCleaner get to
          // them — nondeterministic within a sweep. Drop them
          // deterministically so run N's storage can never skew run
          // N+1's timing (safe here: the finished run's frames are never
          // consumed again).
          //
          // blocking = TRUE is load-bearing (the r7 d10 incident): with
          // blocking = false the removal only ENQUEUES, so run N's block
          // set can still be resident while run N+1 re-creates the same
          // volume — double-resident checkpoint storage that evicts
          // MEMORY_AND_DISK blocks to disk exactly for the checkpoint-
          // heavy neighbors. The r7 driver sweep
          // (bench_archive/r07_driver_sweep.json) recorded one contiguous
          // ~30 s slow window spanning d09-run2 (16.4 s) → d10-run1
          // (8.2 s) → d10-run2 (5.8 s) — the two adjacent queries with
          // the registry's largest checkpoint frames (d09: per-round CC
          // edges; d10: every positional 12-token window) — on
          // byte-identical code whose re-run at the same load_avg gives
          // d09 4.3–4.7 s and d10 0.85–1.3 s
          // (bench_archive/r08_samecode_sweep.json, still blocking=false)
          // and with this fix d09 4.5–5.6 s, d10 0.96–1.42 s at HIGHER
          // load (bench_archive/r08_postfix_sweep.json). The synchronous
          // wait costs milliseconds and removes the only cross-run state
          // channel a sweep has.
          spark.catalog.clearCache()
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = true))
          (sec, ok)
        }
        val baseRuns = (1 to repeats).map(_ => runOnce())
        def bestOf(rs: Seq[(Double, Boolean)]): Double = {
          // headline = best SUCCESSFUL run: a crashed repeat's (typically
          // fast) duration must never become the per-query number — the
          // query still lands in `errors` if ANY repeat failed. When EVERY
          // repeat failed, record the MAX duration: a crash may read
          // slower than it ran, never faster, so an all-failed query can
          // never pull the summed total DOWN across rounds
          val good = rs.filter(_._2)
          if (good.nonEmpty) good.map(_._1).min else rs.map(_._1).max
        }
        // load adjudication: only successful-and-slow triggers re-runs
        // (a crashed query is an `errors` finding, not a load artifact)
        val firstBest = bestOf(baseRuns)
        def slow(b: Double, t: Double): Boolean = b > 2 * t && b - t > 0.3
        val adjudication = trailing.get(name)
          .filter(t => baseRuns.forall(_._2) && slow(firstBest, t))
        val extraRuns = adjudication.toSeq.flatMap { t =>
          // up to 2 extra runs, stopping as soon as one lands in-range
          val r1 = runOnce()
          if (r1._2 && !slow(r1._1, t)) Seq(r1) else Seq(r1, runOnce())
        }
        val runs = baseRuns ++ extraRuns
        val best = bestOf(runs)
        val outlier = adjudication.map(t => (t, firstBest, best, extraRuns.size))
        (name, best, runs.forall(_._2), runs.map(_._1), outlier)
      }
    val loadAfter =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .getSystemLoadAverage
    // 3-decimal fixed-point formatting: 17-digit doubles once overflowed the
    // driver's single-line output capture and truncated the JSON.
    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v, _, _, _) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val reps = results.map { case (k, _, _, rs, _) =>
      "\"" + k + "\":" + rs.map(f3).mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val errs = results.collect { case (k, _, false, _, _) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    // every load adjudication, annotated: trailing median, the best
    // before re-runs, the final best, and how many extra runs it took.
    // resolved = the re-runs brought the query back inside the 2x gate;
    // an unresolved entry is a genuine finding, not an artifact.
    val outliers = results.collect { case (k, _, _, _, Some((t, fb, b, n))) =>
      val resolved = !(b > 2 * t && b - t > 0.3)
      s"""\"$k\":{"trailing":${f3(t)},"first_best":${f3(fb)},"final_best":${f3(b)},"extra_runs":$n,"resolved":$resolved}"""
    }.mkString("{", ",", "}")
    val subset = only.map(names =>
      s""","subset":true,"only":"${names.toSeq.sorted.mkString(",")}"""")
      .getOrElse("")
    val json =
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","best_of":$repeats,"queries":$qs,"repeats":$reps,"errors":$errs,"outliers":$outliers,"sf":"$sfDir","action":"noop_write","load_avg_before":${f3(loadBefore)},"load_avg_after":${f3(loadAfter)}$subset}"""
    // Belt and braces: stdout for the driver's capture AND a file, so a
    // truncated tail can never lose the round's perf signal again.
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_results.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), json + "\n")
    catch { case _: Throwable => () }
    println(json)
    // The driver's capture keeps only the LAST ~2000 chars of stdout and
    // parses the metric line out of that window (BENCH_r05 parsed at 70
    // queries; r06-r08 all came back parsed:null once the full line
    // outgrew it). The full per-query JSON lives in bench_results.json
    // (committed) and in the full line above; the LAST line printed is a
    // compact summary guaranteed to fit the window, with `queries`
    // populated only when the full map still fits.
    // errors are capped in the compact line: a sweep where MOST queries
    // fail (bad SF dir, another schema-drift round hitting every table)
    // would otherwise push even the queries:{} fallback past the window —
    // exactly the failure the compact line exists to report. Full list
    // stays in the JSON file and the full line above.
    val errNames = results.collect { case (k, _, false, _, _) => k }
    val errsCompact =
      if (errNames.size <= 8) errs
      else errNames.take(8).map("\"" + _ + "\"")
        .mkString("[", ",", s""",\"...${errNames.size - 8} more\"]""")
    val compactBase =
      s""""unit":"sec","best_of":$repeats,"n_queries":${results.size},"n_errors":${errNames.size},"n_outliers":${results.count(_._5.isDefined)},"queries_file":"$outFile","errors":$errsCompact,"sf":"$sfDir","action":"noop_write","load_avg_before":${f3(loadBefore)},"load_avg_after":${f3(loadAfter)}$subset}"""
    val withQs =
      s"""{"metric":"total","value":${f3(total)},"queries":$qs,$compactBase"""
    val compact =
      if (withQs.length <= 1800) withQs
      else s"""{"metric":"total","value":${f3(total)},"queries":{},$compactBase"""
    println(compact)
    spark.stop()
  }
}
