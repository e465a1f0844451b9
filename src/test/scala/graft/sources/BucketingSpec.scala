package graft.sources

import graft.SparkTestBase

class BucketingSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("bucketed tables join with zero exchanges and match the plain join") {
    val spark0 = spark
    import org.apache.spark.sql.functions._
    val orders = graft.core.Tables.load(spark0, sf, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val cust = graft.core.Tables.load(spark0, sf, "customer")
      .select("c_custkey", "c_nationkey")

    spark0.sql("DROP TABLE IF EXISTS b_orders")
    spark0.sql("DROP TABLE IF EXISTS b_customer")
    Bucketing.writeBucketed(orders, "b_orders", "o_custkey", buckets = 8)
    Bucketing.writeBucketed(cust, "b_customer", "c_custkey", buckets = 8)

    val savedBroadcast = spark0.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // disable broadcast so the co-location (not a broadcast) kills the
    // exchange — the property that matters when BOTH sides are huge
    spark0.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = Bucketing.colocatedJoin(spark0, "b_orders", "b_customer",
        "o_custkey", "c_custkey")
        .select(col("o_orderkey"), col("o_totalprice"), col("c_nationkey"))
      val got = j.collect()

      val plan = {
        val full = j.queryExecution.executedPlan.toString
        val cut = full.indexOf("== Initial Plan ==")
        if (cut >= 0) full.substring(0, cut) else full
      }
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n${plan.take(1500)}")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n${plan.take(2000)}")
      assert(plan.contains("Bucketed: true"), "scan should read bucket layout")

      val expected = orders.join(cust, col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("o_totalprice"), col("c_nationkey"))
        .collect()
      assert(got.map(_.toString).sorted.toSeq ===
        expected.map(_.toString).sorted.toSeq)
    } finally {
      spark0.conf.set("spark.sql.autoBroadcastJoinThreshold", savedBroadcast)
      spark0.sql("DROP TABLE IF EXISTS b_orders")
      spark0.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("date-partitioned layout: partition filter prunes directories at plan time") {
    import org.apache.spark.sql.functions._
    val dir = tmpDir()
    val ev = graft.core.Tables.events(spark, sf)
      .withColumn("event_date", to_date(col("ts")))
    Bucketing.writeDatePartitioned(ev, dir, "event_date")
    val someDay = ev.select("event_date").head().getDate(0)
    val q = spark.read.parquet(dir)
      .filter(col("event_date") === lit(someDay))
      .select("event_id", "event_type")
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator.find(_.contains("FileScan")).getOrElse("")
    assert(scanLine.contains("PartitionFilters: [") &&
      scanLine.replaceAll(".*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("event_date"),
      s"date filter must be a partition filter, not a data filter:\n$scanLine")
    // and it must NOT be pushed as a row-level parquet filter — the
    // directory listing already excluded the other days
    assert(!scanLine.replaceAll(".*PushedFilters: \\[([^\\]]*)\\].*", "$1")
      .contains("event_date"), s"partition column leaked into PushedFilters:\n$scanLine")
  }

  test("bucket-pruned scan: equality filter on the bucket key reads one bucket") {
    val spark0 = spark
    import org.apache.spark.sql.functions._
    val orders = graft.core.Tables.load(spark0, sf, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    spark0.sql("DROP TABLE IF EXISTS bp_orders")
    Bucketing.writeBucketed(orders, "bp_orders", "o_custkey", buckets = 8)
    // the planner turns bucketed scans OFF when they don't change the
    // plan shape ("disabled by query planner") — force them so the
    // filter's bucket pruning is observable
    val savedAuto = spark0.conf
      .get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    spark0.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val someKey = orders.select("o_custkey").head().getLong(0)
      val q = spark0.table("bp_orders").filter(col("o_custkey") === someKey)
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      // Spark reports bucket pruning on the scan: 1 out of 8 selected
      assert(plan.contains("SelectedBucketsCount: 1 out of 8"),
        s"equality on the bucket key should prune to one bucket:\n${plan.take(1500)}")
    } finally {
      spark0.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", savedAuto)
      spark0.sql("DROP TABLE IF EXISTS bp_orders")
    }
  }

  test("dynamic partition pruning: a dim-side filter prunes fact partitions at runtime") {
    import org.apache.spark.sql.functions._
    // The filter that selects the dates lives on the DIMENSION, so
    // plan-time pruning cannot see it — only DPP can: the broadcast dim's
    // key set becomes a runtime partition filter on the fact scan
    // (dynamicpruningexpression), and a day-filtered join over a 100 TB
    // event lake lists only the surviving directories.
    val dir = tmpDir()
    val ev = graft.core.Tables.events(spark, sf)
      .withColumn("event_date", to_date(col("ts")))
    Bucketing.writeDatePartitioned(ev, dir, "event_date")
    val fact = spark.read.parquet(dir)
    val calendar = ev.select("event_date").distinct()
      .withColumn("dow", dayofweek(col("event_date")))
    val nDates = calendar.count()
    val chosenDow = calendar.head().getInt(1)
    val dim = calendar.filter(col("dow") === chosenDow)
    val nPicked = dim.count()
    assert(nPicked > 0 && nPicked < nDates,
      "the dim filter must keep a strict subset of partitions")
    val joined = fact.join(broadcast(dim), Seq("event_date"))
      .select("event_id", "event_type", "event_date")
    val got = joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruningexpression"),
      s"the fact scan must carry a runtime partition filter:\n${plan.take(2000)}")
    // and the pruned join returns exactly the rows of the picked dates
    val expected = ev.join(dim.select("event_date"), Seq("event_date")).count()
    assert(got.length.toLong === expected)
  }
}
