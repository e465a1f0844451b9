package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only scratchpad for micro-experiments (not part of the driver
  * contract). Current probe: driver-side DataFrame-CREATION cost of
  * `spark.read.parquet` — file listing + parquet footer schema
  * inference — vs the same read with an explicit schema, per fresh
  * relation, warm. The IVM epoch appliers create ~6 fresh store
  * relations per epoch (readPartitionPathsAt per side + view + lookup),
  * so a per-creation fixed cost is a per-epoch driver tax.
  */
object DevScratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.LocalFs(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      )
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[scratch] $label%-55s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }

    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // a 16-dir store stand-in: write orders bucketed by pk into 16 dirs
    val root = java.nio.file.Files.createTempDirectory("scratch_store").toString
    val base = graft.core.Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey").as("k"),
        expr("cast(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))
      .withColumn("pk", pmod(col("k"), lit(16L)))
    base.write.partitionBy("pk").parquet(s"$root/t")
    val dirs = (0 until 16).map(i => s"$root/t/pk=$i")
    val sch = org.apache.spark.sql.types.StructType.fromDDL(
      "k BIGINT, cents BIGINT")

    // warm
    spark.read.parquet(dirs: _*).limit(1).collect()
    for (r <- 1 to 3) {
      time(s"create inferred 16-path x10 r$r") {
        (1 to 10).foreach(_ => spark.read.parquet(dirs: _*))
      }
      time(s"create schema'd 16-path x10 r$r") {
        (1 to 10).foreach(_ => spark.read.schema(sch).parquet(dirs: _*))
      }
      time(s"create inferred 1-path x10 r$r") {
        (1 to 10).foreach(_ => spark.read.parquet(dirs.head))
      }
      time(s"create schema'd 1-path x10 r$r") {
        (1 to 10).foreach(_ => spark.read.schema(sch).parquet(dirs.head))
      }
      time(s"count schema'd 16-path x5 r$r") {
        (1 to 5).foreach(_ =>
          spark.read.schema(sch).parquet(dirs: _*)
            .write.format("noop").mode("overwrite").save())
      }
      time(s"count inferred 16-path x5 r$r") {
        (1 to 5).foreach(_ =>
          spark.read.parquet(dirs: _*)
            .write.format("noop").mode("overwrite").save())
      }
    }
    spark.stop()
  }
}
