package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway micro-experiments for the optimization round. Deleted
  * before the round closes; never part of the driver contract.
  */
object DevScratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[scratch] $label%-50s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }

    // 16-dir partitioned store like an IVM base
    val root = java.nio.file.Files.createTempDirectory("scratch").toString
    val base = spark.range(150000)
      .select(col("id").as("k"), (col("id") % 1000).as("ck"),
        (col("id") * 7 % 100000).as("cents"),
        pmod(col("id"), lit(16L)).as("pk"))
    time("seed write (16 dirs, clustered)") {
      base.repartition(col("pk")).write.partitionBy("pk")
        .parquet(s"$root/t16")
    }
    val paths = (0L until 16L).map(v => s"$root/t16/pk=$v")
    // warm runs after one cold
    time("cold: read 16 paths -> noop") {
      spark.read.parquet(paths: _*).write.format("noop").mode("overwrite").save()
    }
    for (i <- 1 to 3) time(s"warm$i: read 16 paths -> noop") {
      spark.read.parquet(paths: _*).write.format("noop").mode("overwrite").save()
    }
    for (i <- 1 to 2) time(s"warm$i: read 16 paths, 1 shuffle agg -> noop") {
      spark.read.parquet(paths: _*).groupBy("ck").agg(sum("cents"))
        .write.format("noop").mode("overwrite").save()
    }
    for (i <- 1 to 2) time(s"warm$i: flat write 150k rows (no repart)") {
      spark.read.parquet(paths: _*)
        .write.mode("overwrite").parquet(s"$root/out_flat$i")
    }
    for (i <- 1 to 2) time(s"warm$i: repart(pk)+partitionBy write") {
      spark.read.parquet(paths: _*).withColumn("pk", pmod(col("k"), lit(16L)))
        .repartition(col("pk")).write.partitionBy("pk")
        .mode("overwrite").parquet(s"$root/out_part$i")
    }
    for (i <- 1 to 2) time(s"warm$i: partitionBy write NO repart") {
      spark.read.parquet(paths: _*).withColumn("pk", pmod(col("k"), lit(16L)))
        .write.partitionBy("pk")
        .mode("overwrite").parquet(s"$root/out_nopart$i")
    }
    // does localCheckpoint preserve hash partitioning for later joins?
    val big = spark.range(100000).select(col("id").as("vec_id"),
      (col("id")*3).as("v"))
      .repartition(col("vec_id")).localCheckpoint(true)
    val probe = spark.range(50).select(col("id").as("vec_id"))
    val j = probe.hint("shuffle_hash").join(big, Seq("vec_id"))
    j.write.format("noop").mode("overwrite").save()
    println("[scratch] join plan (look for Exchange count over big side):")
    println(j.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Exchange") || l.contains("Scan") || l.contains("Join"))
      .mkString("\n"))

    // tiny frames: per-job fixed cost
    val tiny = spark.range(100).select(col("id").as("k")).localCheckpoint(true)
    for (i <- 1 to 3) time(s"warm$i: tiny collect") { tiny.collect(): Unit }
    for (i <- 1 to 3) time(s"warm$i: tiny 1-row write parquet") {
      tiny.coalesce(1).write.mode("overwrite").parquet(s"$root/tiny$i")
    }
    spark.stop()
  }
}
