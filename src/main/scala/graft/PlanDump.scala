package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: dump the executed plan of named queries at a given SF. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.LocalFs(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      )
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- args) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect()
      val full = df.queryExecution.executedPlan.toString
      val cut = full.indexOf("== Initial Plan ==")
      println(s"===== $name =====")
      println(if (cut >= 0) full.substring(0, cut) else full)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
