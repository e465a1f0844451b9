package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table plumbing — the co-located-join path for repeated big
  * joins on a stable key (SURVEY §6: "pre-partition once, join many
  * times").
  *
  * A join between two tables bucketed by their join keys with the SAME
  * bucket count plans with ZERO exchanges: each task reads bucket i of
  * both sides and joins locally, so the shuffle that dominates a
  * large-×-large join at 100 TB is paid ONCE at write time and amortized
  * over every subsequent join, aggregation, or dedup pass on that key.
  * `sortBy` additionally persists the sort most SMJs need. This is the
  * static twin of `repartition(col)` + ReuseExchange (d02's trick): the
  * exchange moves from the query to the layout.
  *
  * Spark's bucketing needs a catalog table (bucket metadata lives in the
  * metastore, not the parquet footers) — plain `.parquet(path)` writes
  * cannot carry it. BucketingSpec asserts the no-exchange plan and the
  * result equality against the unbucketed join.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted parquet catalog table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Inner equi-join of two bucketed tables on `leftKey == rightKey`.
    * With matching bucket counts this plans exchange-free; Spark falls
    * back to a normal shuffled join when the layouts don't line up, so
    * the call is always safe, just not always free.
    */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    spark.table(left).join(spark.table(right),
      col(leftKey) === col(rightKey))
  }

  /** Hive-style directory partitioning — the OTHER layout lever: a filter
    * on the partition column prunes whole directories at PLANNING time
    * (`PartitionFilters` on the scan), so a day's query over a 100 TB
    * event lake lists one directory instead of scanning every file's
    * footer. When the selective filter lives on a JOINED dimension
    * instead, dynamic partition pruning turns the broadcast dim's key
    * set into a runtime partition filter on the fact scan
    * (`dynamicpruningexpression` — spec-pinned in BucketingSpec).
    * Partition by coarse, low-cardinality keys (date, source);
    * bucket by fine join keys — the two compose (partitionBy + bucketBy).
    */
  def writeDatePartitioned(df: DataFrame, path: String,
      partitionCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)
}
