package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: a Spark DataFrame program plus (optionally) the
  * equivalent ANSI SQL that DuckDB runs as the correctness oracle on the
  * same parquet tables. Every oracle-checked query must:
  *   - alias every computed column identically in Spark and SQL;
  *   - end in a total ORDER BY over a unique key set (the driver compare
  *     is order-insensitive in principle but we pin order anyway);
  *   - keep float aggregation deterministic (exact decimal sums cast to
  *     double at the end; per-row IEEE arithmetic is already portable).
  */
final case class Q(
    name: String,
    doc: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    /** Declared output schema for DRIVER-SIDE queries whose `run` cannot
      * produce a plan without executing (streaming replays, warehouse
      * round-trips, eager checkpoints): the schema-only consumers
      * (RegistrySpec's dtype-drift meta-guard) read this instead of
      * calling `run`. Leave None for plan-pure queries — `.schema` on the
      * unexecuted plan is free there, and a declared copy could drift.
      * Drift in a DECLARED schema is still caught downstream: the driver
      * gate hashes the real output's columns and dtypes every round.
      */
    staticSchema: Option[org.apache.spark.sql.types.StructType] = None
)

object Q {
  /** Turn a registry of Q into the SparkEntry maps. */
  def toQueries(qs: Seq[Q]): Map[String, (SparkSession, String) => DataFrame] =
    qs.map(q => q.name -> q.run).toMap
  def toOracles(qs: Seq[Q]): Map[String, String] =
    qs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
