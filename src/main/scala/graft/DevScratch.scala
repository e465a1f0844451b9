package graft

import org.apache.spark.sql.{Column, SparkSession}
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

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[scratch] $label%-50s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }

    // candidate helper: exact scaled-long sum replacing decimal(18,s) sums
    def pow10(s: Int): Long = math.pow(10, s).round
    def scaledLong(e: Column, s: Int): Column =
      floor(e * lit(pow10(s)) + lit(0.5d)).cast("long")
    def unscale(sumL: Column, s: Int): Column =
      (sumL.cast("decimal(38,0)") / lit(pow10(s)).cast("decimal(19,0)"))
    def exactSumDbl(e: Column, s: Int): Column =
      unscale(sum(scaledLong(e, s)), s).cast("double")
    def exactSumDec(e: Column, s: Int): Column =
      unscale(sum(scaledLong(e, s)), s).cast(s"decimal(28,$s)")

    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val li = graft.core.Tables.load(spark, sfDir, "lineitem")
    li.limit(1).collect()

    def bits(d: Double): Long = java.lang.Double.doubleToRawLongBits(d)
    def cmp(label: String, a: Array[org.apache.spark.sql.Row],
            b: Array[org.apache.spark.sql.Row]): Unit = {
      var bad = 0
      a.zip(b).foreach { case (ra, rb) =>
        (1 until ra.length).foreach { i =>
          val va = ra.get(i); val vb = rb.get(i)
          val eq = (va, vb) match {
            case (x: java.lang.Double, y: java.lang.Double) => bits(x) == bits(y)
            case _ => va == vb
          }
          if (!eq) { if (bad < 5) println(s"[scratch] $label MISMATCH $ra vs $rb"); bad += 1 }
        }
      }
      println(s"[scratch] $label rows=${a.length} mismatches=$bad  " +
        s"schemaA/B equal fields: ")
    }

    // (a) q20 shape, double outputs
    val dec20 = li.groupBy(col("l_orderkey")).agg(
      sum((col("l_discount") * col("l_extendedprice")).cast("decimal(18,4)"))
        .cast("double").as("disc_amount"),
      sum(col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double").as("total_price"))
    val lng20 = li.groupBy(col("l_orderkey")).agg(
      exactSumDbl(col("l_discount") * col("l_extendedprice"), 4).as("disc_amount"),
      exactSumDbl(col("l_extendedprice"), 2).as("total_price"))
    for (r <- 1 to 3) {
      time(s"q20 decimal r$r") { dec20.write.format("noop").mode("overwrite").save() }
      time(s"q20 exact   r$r") { lng20.write.format("noop").mode("overwrite").save() }
    }
    cmp("q20", dec20.orderBy("l_orderkey").collect(), lng20.orderBy("l_orderkey").collect())

    // (b) q39 shape, DECIMAL outputs — dtype must match sum(decimal(18,2)) = decimal(28,2)
    val decQ39 = li.groupBy("l_returnflag").agg(
      sum(col("l_quantity").cast("decimal(18,2)")).as("pq"))
    val lngQ39 = li.groupBy("l_returnflag").agg(
      exactSumDec(col("l_quantity"), 2).as("pq"))
    println(s"[scratch] q39 dtypes dec=${decQ39.schema("pq").dataType} lng=${lngQ39.schema("pq").dataType}")
    cmp("q39", decQ39.orderBy("l_returnflag").collect(), lngQ39.orderBy("l_returnflag").collect())

    // (c) window shape (q23)
    val ev = graft.core.Tables.events(spark, sfDir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val decW = ev.select(col("event_id"),
      sum(col("value").cast("decimal(18,4)")).over(w.rowsBetween(-2, 0))
        .cast("double").as("t3"))
    val lngW = ev.select(col("event_id"),
      unscale(sum(scaledLong(col("value"), 4)).over(w.rowsBetween(-2, 0)), 4)
        .cast("double").as("t3"))
    for (r <- 1 to 2) {
      time(s"q23 decimal r$r") { decW.write.format("noop").mode("overwrite").save() }
      time(s"q23 exact   r$r") { lngW.write.format("noop").mode("overwrite").save() }
    }
    cmp("q23", decW.orderBy("event_id").collect(), lngW.orderBy("event_id").collect())

    // (d) adversarial magnitudes: values above 2^53 after scaling, negatives
    val big = spark.range(200000).select(col("id"),
      (col("id") % 97).as("g"),
      ((col("id").cast("double") - 100000.0) * 1234567.89).as("v"))
    val decB = big.groupBy("g").agg(
      sum(col("v").cast("decimal(18,2)")).cast("double").as("s"),
      sum(col("v").cast("decimal(18,2)")).as("sd"))
    val lngB = big.groupBy("g").agg(
      exactSumDbl(col("v"), 2).as("s"),
      exactSumDec(col("v"), 2).as("sd"))
    cmp("big", decB.orderBy("g").collect(), lngB.orderBy("g").collect())
    spark.stop()
  }
}
