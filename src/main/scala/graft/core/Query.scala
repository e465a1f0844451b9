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
    oracle: Option[String] = None
)

object Q {
  /** Turn a registry of Q into the SparkEntry maps. */
  def toQueries(qs: Seq[Q]): Map[String, (SparkSession, String) => DataFrame] =
    qs.map(q => q.name -> q.run).toMap
  def toOracles(qs: Seq[Q]): Map[String, String] =
    qs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
