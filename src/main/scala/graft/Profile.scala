package graft

import org.apache.spark.sql.SparkSession

/** Dev-only stage profiler: times count() of intermediate subplans of the
  * hottest bench queries, to locate where the wall-clock goes before
  * optimizing (spark-perf-pitfalls: profile per subplan, don't guess).
  * Not part of the driver contract.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.LocalFs(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      )
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s  ($n rows)")
    }

    val ex = graft.operators.Dedup.explodedShingles(spark, sfDir)
    time("shingle kernel (uncached count)") { ex.count() }
    val exC = ex.cache()
    time("cache materialize") { exC.count() }
    time("cached re-count") { exC.count() }

    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window

    // d06 stages
    val t = 0.5
    val wDf = Window.partitionBy(col("shingle"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("df").asc, col("shingle").asc)
    val prefix = exC.withColumn("df", count(lit(1)).over(wDf))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= col("nsh") - ceil(col("nsh") * t) + 1)
      .select(col("doc_id"), col("shingle"))
    time("d06 prefix frame") { prefix.count() }
    val cand = prefix.as("x").join(prefix.as("y"), Seq("shingle"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    time("d06 candidates") { cand.count() }

    // d02 stages
    val a2 = exC.select(col("doc_id").as("doc_a"), col("nsh").as("size_a"), col("shingle"))
    val b2 = exC.select(col("doc_id").as("doc_b"), col("nsh").as("size_b"), col("shingle"))
    val joined = a2.join(b2, Seq("shingle")).filter(col("doc_a") < col("doc_b"))
    time("d02 join output") { joined.count() }
    val grouped = joined.groupBy("doc_a", "doc_b", "size_a", "size_b")
      .agg(count(lit(1)).as("intersection"))
    time("d02 grouped pairs") { grouped.count() }

    // repartition-reuse variant
    val exR = exC.repartition(col("shingle"))
    val aR = exR.select(col("doc_id").as("doc_a"), col("nsh").as("size_a"), col("shingle"))
    val bR = exR.select(col("doc_id").as("doc_b"), col("nsh").as("size_b"), col("shingle"))
    val jR = aR.join(bR, Seq("shingle")).filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b", "size_a", "size_b").agg(count(lit(1)).as("i"))
    time("d02 grouped (repartition reuse)") { jR.count() }

    // d03 stages
    import graft.functions.Portable._
    val g = exC.withColumn("g", col("shingle") % MinHashP)
    val mhCols = (0 until 30).map(k => min(perm(k, col("g"))).as(s"mh_$k"))
    val sigs = g.groupBy("doc_id").agg(mhCols.head, mhCols.tail: _*)
    time("d03 minhash signatures") { sigs.count() }
    val bands = sigs.select(col("doc_id"), explode(array(
      (0 until 10).map(j => struct(lit(j).as("band"),
        concat_ws("_", col(s"mh_${3 * j}"), col(s"mh_${3 * j + 1}"),
          col(s"mh_${3 * j + 2}")).as("bkey"))): _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
    val cand3 = bands.as("x").join(bands.as("y"), Seq("band", "bkey"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    time("d03 lsh candidates") { cand3.count() }

    spark.stop()
  }
}
