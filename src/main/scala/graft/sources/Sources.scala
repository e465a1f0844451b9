package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.compendium.{BioSampleXml, EUtils, ResultsLoad, SummaryQC}

/** Facade over the engine's source/scan operators (SURVEY §2.1) — the
  * implementations live with their domains in `graft.compendium`; this
  * object is the one-stop index mapping each inventory item to its reader.
  *
  *  S1 BioSample XML   → biosampleXml (record-split distributed parse)
  *  S2 eUtils efetch   → efetchResponse (driver-side parse; HTTP behind
  *                       EUtilsClient)
  *  S3 summary.tsv     → summaryTsv (header-driven, paired detection)
  *  S4 counts matrix   → countsMatrix (wide → sparse triplets)
  *  S5 FASTA           → fasta ('>'-delimited record split)
  *  S6 taxonomy TSV    → taxonomy
  *  S7/S8 line lists   → lines (accession lists, sources.txt)
  */
object Sources {
  def biosampleXml(spark: SparkSession, path: String): DataFrame =
    BioSampleXml.read(spark, path)
  def efetchResponse(xml: String): Seq[graft.compendium.SraRunInfo] =
    EUtils.parseResponse(xml)
  def summaryTsv(spark: SparkSession, path: String): DataFrame =
    SummaryQC.readSummaryTsv(spark, path)
  def countsMatrix(spark: SparkSession, path: String): DataFrame =
    ResultsLoad.readCountsMatrix(spark, path)
  def fasta(spark: SparkSession, path: String): DataFrame =
    ResultsLoad.readFasta(spark, path)
  def taxonomy(spark: SparkSession, path: String): DataFrame =
    ResultsLoad.readTaxonomy(spark, path)
  def lines(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
}
