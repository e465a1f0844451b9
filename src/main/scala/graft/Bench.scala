package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen/datasource paths so the first measured queries
    // aren't charged session startup: JIT + codegen compiler init, parquet
    // footer/file-index building per table, and the CSV/text reader class
    // loading the fixture queries hit first (alphabetical order puts c01
    // in front).
    try {
      spark.range(1000).selectExpr("sum(id)").collect()
      graft.core.Tables.all.filterNot(_ == "events").foreach { t =>
        try graft.core.Tables.load(spark, sfDir, t).limit(1).collect()
        catch { case _: Throwable => () }
      }
      graft.core.Tables.events(spark, sfDir).limit(1).collect()
      spark.read.option("sep", "\t").option("header", "true")
        .csv("fixtures/summary.tsv").limit(1).collect()
      spark.read.text("fixtures/sources.txt").limit(1).collect()
    } catch { case _: Throwable => () }
    // Machine-load provenance: bench numbers at local[32] swing ±30% under
    // background load, so record the 1-min load average before and after —
    // a regression on a loaded machine is classifiable without a re-run.
    val loadBefore =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .getSystemLoadAverage
    // Local-iteration escape hatch (never set by the driver): bench only a
    // comma-separated subset of query names.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        name -> (System.nanoTime() - t0) / 1e9
      }.toMap
    val loadAfter =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .getSystemLoadAverage
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","load_avg_before":$loadBefore,"load_avg_after":$loadAfter}""")
    spark.stop()
  }
}
