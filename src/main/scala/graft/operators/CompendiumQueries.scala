package graft.operators

import org.apache.spark.sql.functions._
import graft.core.Q
import graft.compendium._

/** The compendium domain pipeline exposed as driver-runnable queries.
  * These read the reference-shaped fixtures (FIXTURES.md) rather than the
  * sfDir tables, so they carry no DuckDB oracle (driver records a rows-only
  * check); their exact semantics are pinned by the ScalaTest golden suites.
  */
object CompendiumQueries {

  private val fixtures =
    sys.env.getOrElse("GRAFT_FIXTURES_DIR", "/root/repo/fixtures")

  val registry: Seq[Q] = Seq(

    Q("c01_qc_decision",
      "summary.tsv → per-sample QC → project rollup → save/re-run/discard",
      (s, _) => SummaryQC.evaluate(s, s"$fixtures/summary_paired.tsv", "PRJNA12345")),

    Q("c02_qc_samples",
      "per-sample QC metrics and warn/error flags (projects.py:579-629)",
      (s, _) => SummaryQC.sampleQc(
        SummaryQC.readSummaryTsv(s, s"$fixtures/summary_paired.tsv"))
        .orderBy("srr")),

    Q("c03_xml_samples",
      "BioSample XML ingest: distributed record-split parse → samples rows",
      (s, _) => BioSampleXml.samples(
        BioSampleXml.read(s, s"$fixtures/biosamples.xml"), "408170")
        .orderBy("srs")),

    Q("c04_xml_tags",
      "BioSample XML ingest: EAV tag explode (harmonized-name preference)",
      (s, _) => BioSampleXml.tags(
        BioSampleXml.read(s, s"$fixtures/biosamples.xml"))
        .orderBy("srs", "tag")),

    Q("c05_counts_unpivot",
      "wide ASV×sample matrix → sparse triplets, zeros dropped",
      (s, _) => ResultsLoad.readCountsMatrix(s, s"$fixtures/ASVs_counts.tsv")
        .orderBy("sample", "asv")),

    Q("c06_fasta",
      "FASTA scan via '>'-delimited record split",
      (s, _) => ResultsLoad.readFasta(s, s"$fixtures/ASVs.fa").orderBy("asv")),

    Q("c07_taxonomy_assignments",
      "taxonomy ⋈ sequences with deterministic surrogate asv_id",
      (s, _) => ResultsLoad.load(s, fixtures, "PRJNA12345")._3
        .orderBy("asv_id")),

    Q("c08_efetch_parse",
      "eUtils efetch XML → SraRunInfo rows (multi-run ';' join, no-run skip)",
      (s, _) => {
        import s.implicits._
        val xml = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(s"$fixtures/efetch_response.xml")), "UTF-8")
        EUtils.parseResponse(xml).toDF().orderBy("srs")
      }),

    Q("c10_region_inference",
      "per-project 16S hypervariable-region inference (SW align + majority vote)",
      (s, _) => RegionInference.infer(
        ResultsLoad.load(s, fixtures, "PRJNA12345")._2)
        .orderBy("project")),

    Q("c09_source_filter",
      "keep/toss substring classifier over sources.txt (helpers.py:8-21)",
      (s, _) => {
        val keep = Seq("fec", "faec", "stool", "2003", "meconium")
        val toss = Seq("cultur", "swab", "incubat", "rectum", "rectal",
          "virus", "tissue", "soil")
        s.read.text(s"$fixtures/sources.txt")
          .withColumnRenamed("value", "src")
          .withColumn("keep",
            keep.map(col("src").contains(_)).reduce(_ || _) &&
              !toss.map(col("src").contains(_)).reduce(_ || _))
          .orderBy("src")
      })
  )
}
