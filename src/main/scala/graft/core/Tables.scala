package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * Scale note: each table is a plain parquet scan — Catalyst pushes
  * predicates and prunes columns into the scan, so callers should never
  * pre-`select`/`cache` here. At cluster scale these would be partitioned
  * external tables; the API is the same.
  */
object Tables {
  val tpch: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val extended: Seq[String] = Seq("events", "documents", "embeddings")
  val all: Seq[String] = tpch ++ extended

  /** Schema memo per input file: `spark.read.parquet` without a schema
    * pays driver-side footer inference on EVERY DataFrame creation
    * (~85 ms/call measured warm at sf0.1 — a per-query tax times every
    * table load of every query). The driver-provided tables are
    * immutable for the life of a run, so the first inference is
    * authoritative and every later load passes it explicitly. Metadata
    * memo only — the scan itself still reads the parquet files on every
    * execution (no data is cached).
    */
  private val schemaMemo =
    new java.util.concurrent.ConcurrentHashMap[
      String, org.apache.spark.sql.types.StructType]()

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val sch = schemaMemo.computeIfAbsent(path,
      _ => spark.read.parquet(path).schema)
    spark.read.schema(sch).parquet(path)
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events.parquet has shipped with two physical `ts` encodings across
    * testdata generations: parquet TIMESTAMP(NANOS) (which Spark's
    * vectorized reader rejects — read nanos as LongType and floor-truncate
    * to microseconds, the same truncation DuckDB applies since its
    * TIMESTAMP is µs) and TIMESTAMP(MICROS, isAdjustedToUTC=false) (reads
    * as TIMESTAMP_NTZ). Normalize both to TIMESTAMP_LTZ: every session
    * here pins spark.sql.session.timeZone=UTC, so the NTZ→LTZ cast maps
    * wall time to the identical instant DuckDB's naive-as-UTC reader sees,
    * and epoch functions (unix_millis & co) — which reject NTZ — keep
    * working across generations. The oracle reads the same file, so
    * comparisons stay exact in all cases.
    *
    * ==Side effect (deliberate, permanent)==
    * This loader SETS `spark.sql.session.timeZone=UTC` on the caller's
    * session and does NOT restore it. Scoping the pin to the NTZ→LTZ
    * cast would not be enough: every DOWNSTREAM wall-time expression
    * over the returned LTZ column (`date_trunc`, `year`/`month`,
    * `hour` — q21's hourly rollup, q40's cohort months) resolves the
    * session zone at ITS OWN analysis time, after this method returned,
    * and the DuckDB oracle reads the same file naive-as-UTC — so on a
    * non-UTC host a save/restore here would silently shift every
    * wall-time-derived result away from the oracle while the loader
    * itself looked "clean". UTC-pinned sessions are therefore part of
    * this loader's contract (every main in this repo pins it at build
    * time anyway); callers embedding graft in a session that NEEDS a
    * different zone for their own queries must re-set it after the
    * events-derived frames are materialized.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Pin the session zone HERE, not just in our own mains: the NTZ→LTZ
    // cast below reads it, and the driver contract hands us arbitrary
    // sessions — on a non-UTC host default the cast would silently shift
    // every instant away from the oracle's naive-as-UTC read. See the
    // class doc: downstream wall-time exprs need the pin too, so a
    // save/restore would be WRONG, not just cosmetic.
    s.conf.set("spark.sql.session.timeZone", "UTC")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          df("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
