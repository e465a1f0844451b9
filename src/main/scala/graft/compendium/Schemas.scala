package graft.compendium

import org.apache.spark.sql.types._

/** The reference's nine-table data model (SURVEY.md §1.2; db.py:85-186)
  * as Spark StructTypes, plus the in-flight record case classes.
  *
  * SQLite's dynamic typing is replaced by declared columnar schemas:
  * integers that carry 0/1 flags become BooleanType, `pubdate` stays a
  * string at ingest (SRA publishes `YYYY-MM-DD HH:MM:SS`, db.py:405-406)
  * and is parsed to timestamp at query time.
  */
object Schemas {

  // db.py:89-102
  val samples: StructType = StructType(Seq(
    StructField("srs", StringType, nullable = false),
    StructField("project", StringType),
    StructField("taxon", StringType),
    StructField("srr", StringType),
    StructField("library_strategy", StringType),
    StructField("library_source", StringType),
    StructField("instrument", StringType),
    StructField("pubdate", TimestampType),
    StructField("total_bases", LongType),
    StructField("geo_loc_name", StringType)))

  // db.py:104-109
  val geoLocCountries: StructType = StructType(Seq(
    StructField("geo_loc_name", StringType, nullable = false),
    StructField("iso2", StringType, nullable = false)))

  // db.py:111-117
  val countries: StructType = StructType(Seq(
    StructField("iso2", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("region", StringType, nullable = false)))

  // db.py:119-126 — EAV tags; surrogate tagid dropped (long-form table).
  val tags: StructType = StructType(Seq(
    StructField("srs", StringType, nullable = false),
    StructField("tag", StringType, nullable = false),
    StructField("value", StringType)))

  // db.py:137-146 — 0/1 ints become booleans (written 0/1 at
  // projects.py:322-326, 402-406).
  val status: StructType = StructType(Seq(
    StructField("project", StringType, nullable = false),
    StructField("status", StringType, nullable = false),
    StructField("rerun_as_single_end", BooleanType, nullable = false),
    StructField("paired", BooleanType),
    StructField("note1", StringType),
    StructField("note2", StringType)))

  // db.py:149-156 — sparse triplet matrix; entryid dropped.
  val asvCounts: StructType = StructType(Seq(
    StructField("sample", StringType, nullable = false),
    StructField("asv", StringType, nullable = false),
    StructField("count", LongType, nullable = false)))

  // db.py:158-165 — asv_id is a load-bearing surrogate key
  // (projects.py:499-523); generated deterministically, see ResultsLoad.
  val asvSequences: StructType = StructType(Seq(
    StructField("asv_id", LongType, nullable = false),
    StructField("project", StringType, nullable = false),
    StructField("asv", StringType, nullable = false),
    StructField("seq", StringType)))

  // db.py:167-178
  val asvAssignments: StructType = StructType(Seq(
    StructField("asv_id", LongType, nullable = false),
    StructField("tdatabase", StringType),
    StructField("kingdom", StringType),
    StructField("phylum", StringType),
    StructField("tclass", StringType),
    StructField("torder", StringType),
    StructField("family", StringType),
    StructField("genus", StringType)))

  // db.py:180-186
  val asvInference: StructType = StructType(Seq(
    StructField("project", StringType, nullable = false),
    StructField("region", StringType),
    StructField("length", DoubleType)))
}

/** Per-sample QC record parsed from summary.tsv (projects.py:580-597).
  * `revse`/`merged` are absent for single-end projects (header-driven,
  * projects.py:588).
  */
final case class SampleQC(
    srr: String,
    dinput: Long,
    filter: Long,
    forwd: Long,
    length: Long,
    nonchim: Long,
    revse: Option[Long],
    merged: Option[Long])

/** In-flight eUtils enrichment record (db.py:397-419) — any field but srs
  * may be absent in the response.
  */
final case class SraRunInfo(
    srs: String,
    srr: Option[String],
    project: Option[String],
    pubdate: Option[String],
    total_bases: Option[Long],
    library_strategy: Option[String],
    library_source: Option[String],
    instrument: Option[String])
