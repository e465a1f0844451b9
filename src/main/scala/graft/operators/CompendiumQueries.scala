package graft.operators

import org.apache.spark.sql.functions._
import graft.core.Q
import graft.compendium._

/** The compendium domain pipeline exposed as driver-runnable queries over
  * the reference-shaped fixtures (FIXTURES.md). The oracle SQL re-reads the
  * same fixture files (read_csv/read_text + regexp extraction) and
  * recomputes each pipeline independently in DuckDB; only c10
  * (Smith-Waterman region inference) stays a rows-only check, pinned
  * instead by the golden specs against an independent DP implementation.
  */
object CompendiumQueries {

  private val fixtures =
    sys.env.getOrElse("GRAFT_FIXTURES_DIR", "/root/repo/fixtures")

  /** Shared oracle fragment: summary_paired.tsv → per-sample QC flags
    * (mirrors SummaryQC.readSummaryTsv + sampleQc in DuckDB SQL).
    */
  private val sqlQcBase =
    s"""WITH raw AS (SELECT * FROM read_csv('$fixtures/summary_paired.tsv', delim='\t', header=true)),
       |s AS (SELECT
       |    substr(column0, 1, greatest(length(column0) - 8, 0)) AS srr,
       |    dinput::BIGINT AS dinput, "filter"::BIGINT AS "filter",
       |    revse::BIGINT AS revse, forwd::BIGINT AS forwd, merged::BIGINT AS merged,
       |    length::BIGINT AS length, nonchim::BIGINT AS nonchim
       |  FROM raw),
       |qc AS (SELECT *,
       |    true AS is_paired,
       |    CASE WHEN length = 0 THEN NULL ELSE 1.0 - nonchim::DOUBLE / length::DOUBLE END AS chimera_percent,
       |    CASE WHEN dinput IS NULL OR dinput = 0 THEN NULL ELSE nonchim::DOUBLE / dinput::DOUBLE END AS retained_percent,
       |    CASE WHEN forwd IS NULL OR forwd = 0 THEN NULL ELSE merged::DOUBLE / forwd::DOUBLE END AS merged_percent
       |  FROM s),
       |fl AS (SELECT *,
       |    coalesce(chimera_percent > 0.10, false) AS chimera_warn,
       |    coalesce(chimera_percent > 0.20, false) AS chimera_error,
       |    coalesce(retained_percent < 0.69, false) AS retained_warn,
       |    coalesce(retained_percent < 0.59, false) AS retained_error,
       |    coalesce(merged_percent < 0.80, false) AS merged_warn,
       |    coalesce(merged_percent < 0.65, false) AS merged_error
       |  FROM qc)""".stripMargin

  val registry: Seq[Q] = Seq(

    Q("c01_qc_decision",
      "summary.tsv → per-sample QC → project rollup → save/re-run/discard",
      (s, _) => SummaryQC.evaluate(s, s"$fixtures/summary_paired.tsv", "PRJNA12345"),
      Some(s"""$sqlQcBase,
             |roll AS (SELECT
             |    'PRJNA12345' AS project,
             |    count(*)::BIGINT AS sample_count,
             |    bool_and(is_paired) AS paired,
             |    avg(CASE WHEN retained_warn THEN 1.0 ELSE 0.0 END) AS retained_warn_frac,
             |    avg(CASE WHEN retained_error THEN 1.0 ELSE 0.0 END) AS retained_error_frac,
             |    avg(CASE WHEN chimera_warn THEN 1.0 ELSE 0.0 END) AS chimera_warn_frac,
             |    avg(CASE WHEN chimera_error THEN 1.0 ELSE 0.0 END) AS chimera_error_frac,
             |    avg(CASE WHEN merged_warn THEN 1.0 ELSE 0.0 END) AS merged_warn_frac,
             |    avg(CASE WHEN merged_error THEN 1.0 ELSE 0.0 END) AS merged_error_frac
             |  FROM fl),
             |dec AS (SELECT *,
             |    (merged_warn_frac > 0.4 OR merged_error_frac > 0.15) AS re_run
             |  FROM roll)
             |SELECT project, sample_count, paired,
             |  retained_warn_frac, retained_error_frac, chimera_warn_frac,
             |  chimera_error_frac, merged_warn_frac, merged_error_frac,
             |  re_run,
             |  (NOT re_run AND (retained_warn_frac > 0.70 OR retained_error_frac > 0.20
             |     OR chimera_warn_frac > 0.4 OR chimera_error_frac > 0.2)) AS discard,
             |  array_to_string(list_filter([
             |    CASE WHEN merged_warn_frac > 0.4 THEN floor(merged_warn_frac*100)::INT::VARCHAR || '% of samples had warning for merged read count.' END,
             |    CASE WHEN merged_error_frac > 0.15 THEN floor(merged_error_frac*100)::INT::VARCHAR || '% of samples had ERROR for merged read count.' END,
             |    CASE WHEN NOT re_run AND retained_warn_frac > 0.70 THEN floor(retained_warn_frac*100)::INT::VARCHAR || '% of samples had warning for reads retained.' END,
             |    CASE WHEN NOT re_run AND retained_error_frac > 0.20 THEN floor(retained_error_frac*100)::INT::VARCHAR || '% of samples had ERROR for reads retained.' END,
             |    CASE WHEN NOT re_run AND chimera_warn_frac > 0.4 THEN floor(chimera_warn_frac*100)::INT::VARCHAR || '% of samples had warning for chimeric read count.' END,
             |    CASE WHEN NOT re_run AND chimera_error_frac > 0.2 THEN floor(chimera_error_frac*100)::INT::VARCHAR || '% of samples had ERROR for chimeric read count.' END
             |  ], x -> x IS NOT NULL), ' / ') AS errors
             |FROM dec""".stripMargin)),

    Q("c02_qc_samples",
      "per-sample QC metrics and warn/error flags (projects.py:579-629)",
      (s, _) => SummaryQC.sampleQc(
        SummaryQC.readSummaryTsv(s, s"$fixtures/summary_paired.tsv"))
        .orderBy("srr"),
      Some(s"""$sqlQcBase
             |SELECT srr, dinput, "filter", revse, forwd, merged, length, nonchim, is_paired,
             |  chimera_percent, chimera_warn, chimera_error,
             |  retained_percent, retained_warn, retained_error,
             |  merged_percent, merged_warn, merged_error
             |FROM fl ORDER BY srr""".stripMargin)),

    Q("c03_xml_samples",
      "BioSample XML ingest: distributed record-split parse → samples rows",
      (s, _) => BioSampleXml.samples(
        BioSampleXml.read(s, s"$fixtures/biosamples.xml"), "408170")
        .orderBy("srs"),
      Some(s"""WITH recs AS (SELECT unnest(string_split(content, '</BioSample>')) AS rec
             |  FROM read_text('$fixtures/biosamples.xml')),
             |ids AS (SELECT
             |    regexp_extract_all(rec, '<Id[^>]*db="SRA"[^>]*>([^<]*)</Id>', 1) AS sras
             |  FROM recs WHERE rec LIKE '%<BioSample%'),
             |good AS (SELECT trim(sras[-1]) AS srs FROM ids WHERE len(sras) > 0)
             |SELECT srs, '408170' AS taxon FROM good WHERE srs <> '' ORDER BY srs""".stripMargin)),

    Q("c04_xml_tags",
      "BioSample XML ingest: EAV tag explode (harmonized-name preference)",
      (s, _) => BioSampleXml.tags(
        BioSampleXml.read(s, s"$fixtures/biosamples.xml"))
        .orderBy("srs", "tag"),
      Some(s"""WITH recs AS (SELECT unnest(string_split(content, '</BioSample>')) AS rec
             |  FROM read_text('$fixtures/biosamples.xml')),
             |ids AS (SELECT rec,
             |    regexp_extract_all(rec, '<Id[^>]*db="SRA"[^>]*>([^<]*)</Id>', 1) AS sras
             |  FROM recs WHERE rec LIKE '%<BioSample%'),
             |good AS (SELECT trim(sras[-1]) AS srs, rec FROM ids
             |  WHERE len(sras) > 0 AND trim(sras[-1]) <> ''),
             |attrs AS (SELECT srs,
             |    unnest(regexp_extract_all(rec, '<Attribute [^>]*>[^<]*</Attribute>')) AS m,
             |    generate_subscripts(regexp_extract_all(rec, '<Attribute [^>]*>[^<]*</Attribute>'), 1) AS pos
             |  FROM good),
             |parsed AS (SELECT srs, pos,
             |    coalesce(nullif(regexp_extract(m, 'harmonized_name="([^"]*)"', 1), ''),
             |             nullif(regexp_extract(m, 'attribute_name="([^"]*)"', 1), '')) AS tag,
             |    lower(replace(replace(replace(replace(replace(
             |      regexp_extract(m, '>([^<]*)<', 1),
             |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&apos;', chr(39)), '&amp;', '&')) AS value
             |  FROM attrs),
             |dedup AS (SELECT srs, tag, arg_max(value, pos) AS value
             |  FROM parsed WHERE tag IS NOT NULL AND value <> '' GROUP BY srs, tag)
             |SELECT srs, tag, value FROM dedup ORDER BY srs, tag""".stripMargin)),

    Q("c05_counts_unpivot",
      "wide ASV×sample matrix → sparse triplets, zeros dropped",
      (s, _) => ResultsLoad.readCountsMatrix(s, s"$fixtures/ASVs_counts.tsv")
        .orderBy("sample", "asv"),
      Some(s"""WITH w AS (SELECT * FROM read_csv('$fixtures/ASVs_counts.tsv', delim='\t', header=true)),
             |u AS (
             |  SELECT SRR0000001 AS cnt, 'SRR0000001' AS sample, column0 AS asv FROM w
             |  UNION ALL SELECT SRR0000002, 'SRR0000002', column0 FROM w
             |  UNION ALL SELECT SRR0000003, 'SRR0000003', column0 FROM w)
             |SELECT sample, asv, cnt::BIGINT AS count FROM u WHERE cnt <> 0
             |ORDER BY sample, asv""".stripMargin)),

    Q("c06_fasta",
      "FASTA scan via '>'-delimited record split",
      (s, _) => ResultsLoad.readFasta(s, s"$fixtures/ASVs.fa").orderBy("asv"),
      Some(s"""WITH t AS (SELECT content FROM read_text('$fixtures/ASVs.fa')),
             |recs AS (SELECT unnest(string_split(content, '>')) AS rec FROM t),
             |parsed AS (SELECT
             |    trim(string_split(rec, chr(10))[1]) AS asv,
             |    list_aggregate(list_filter(string_split(rec, chr(10))[2:], x -> x <> ''), 'string_agg', '') AS seq
             |  FROM recs WHERE rec <> '')
             |SELECT asv, seq FROM parsed WHERE asv <> '' ORDER BY asv""".stripMargin)),

    Q("c07_taxonomy_assignments",
      "taxonomy ⋈ sequences with deterministic surrogate asv_id",
      (s, _) => ResultsLoad.load(s, fixtures, "PRJNA12345")._3
        .orderBy("asv_id"),
      Some(s"""WITH tax AS (SELECT column0 AS asv, Kingdom AS kingdom, Phylum AS phylum,
             |    Class AS tclass, "Order" AS torder, Family AS family, Genus AS genus
             |  FROM read_csv('$fixtures/ASVs_taxonomy.tsv', delim='\t', header=true)),
             |fa AS (SELECT trim(string_split(rec, chr(10))[1]) AS asv
             |  FROM (SELECT unnest(string_split(content, '>')) AS rec
             |        FROM read_text('$fixtures/ASVs.fa')) WHERE rec <> '')
             |SELECT
             |  ('0x' || substr(md5('PRJNA12345' || chr(10) || asv), 1, 15))::BIGINT AS asv_id,
             |  'silva_nr99_v138_train_set' AS tdatabase,
             |  kingdom, phylum, tclass, torder, family, genus
             |FROM tax WHERE asv IN (SELECT asv FROM fa)
             |ORDER BY asv_id""".stripMargin)),

    Q("c08_efetch_parse",
      "eUtils efetch XML → SraRunInfo rows (multi-run ';' join, no-run skip)",
      (s, _) => {
        import s.implicits._
        val xml = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(s"$fixtures/efetch_response.xml")), "UTF-8")
        EUtils.parseResponse(xml).toDF().orderBy("srs")
      },
      Some(s"""WITH recs AS (SELECT unnest(string_split(content, '</EXPERIMENT_PACKAGE>')) AS rec
             |  FROM read_text('$fixtures/efetch_response.xml')),
             |p AS (SELECT rec,
             |    regexp_extract_all(rec, '<SAMPLE[^>]*accession="([^"]*)"', 1) AS samples,
             |    regexp_extract_all(rec, '<RUN [^>]*accession="([^"]*)"', 1) AS runs,
             |    regexp_extract_all(rec, '<RUN [^>]*published="([^"]*)"', 1) AS pubs,
             |    regexp_extract_all(rec, '<RUN [^>]*total_bases="([^"]*)"', 1) AS bases,
             |    regexp_extract_all(rec, '<EXTERNAL_ID[^>]*namespace="BioProject"[^>]*>([^<]*)</EXTERNAL_ID>', 1) AS projects,
             |    regexp_extract_all(rec, '<LIBRARY_STRATEGY>([^<]*)</LIBRARY_STRATEGY>', 1) AS strat,
             |    regexp_extract_all(rec, '<LIBRARY_SOURCE>([^<]*)</LIBRARY_SOURCE>', 1) AS src,
             |    regexp_extract_all(rec, '<INSTRUMENT_MODEL>([^<]*)</INSTRUMENT_MODEL>', 1) AS instr
             |  FROM recs WHERE rec LIKE '%<EXPERIMENT_PACKAGE%')
             |SELECT
             |  samples[-1] AS srs,
             |  array_to_string(runs, ';') AS srr,
             |  CASE WHEN len(projects) > 0 THEN trim(projects[1]) END AS project,
             |  CASE WHEN len(pubs) > 0 THEN pubs[-1] END AS pubdate,
             |  CASE WHEN len(bases) > 0 THEN bases[-1]::BIGINT END AS total_bases,
             |  CASE WHEN len(strat) > 0 THEN trim(strat[-1]) END AS library_strategy,
             |  CASE WHEN len(src) > 0 THEN trim(src[-1]) END AS library_source,
             |  CASE WHEN len(instr) > 0 THEN trim(instr[-1]) END AS instrument
             |FROM p WHERE len(runs) > 0 AND len(samples) > 0
             |ORDER BY srs""".stripMargin)),

    // The Smith-Waterman DP itself is not SQL-expressible, but the fixture
    // OUTPUT is: the region assignment is pinned by the golden specs
    // (RegionInferenceSpec vs an independent DP) as the literal 'None'
    // (the short fixture ASVs fail the >70% coverage majority vote,
    // amplicon.py:72-84), and the avg length is recomputed from the FASTA
    // exactly as the Spark side does (sum of per-seq lengths / n over the
    // taxonomy-semi-joined ASV set — projects.py:478, amplicon.py:57).
    Q("c10_region_inference",
      "per-project 16S hypervariable-region inference (SW align + majority vote)",
      (s, _) => RegionInference.infer(
        ResultsLoad.load(s, fixtures, "PRJNA12345")._2)
        .orderBy("project"),
      Some(s"""WITH t AS (SELECT content FROM read_text('$fixtures/ASVs.fa')),
             |recs AS (SELECT unnest(string_split(content, '>')) AS rec FROM t),
             |fa AS (SELECT
             |    trim(string_split(rec, chr(10))[1]) AS asv,
             |    list_aggregate(list_filter(string_split(rec, chr(10))[2:], x -> x <> ''), 'string_agg', '') AS seq
             |  FROM recs WHERE rec <> ''),
             |tax AS (SELECT column0 AS asv
             |  FROM read_csv('$fixtures/ASVs_taxonomy.tsv', delim='\t', header=true)),
             |seqs AS (SELECT seq FROM fa WHERE asv <> '' AND asv IN (SELECT asv FROM tax))
             |SELECT 'PRJNA12345' AS project, 'None' AS region,
             |  (sum(length(seq))::DOUBLE / count(*)::DOUBLE) AS length
             |FROM seqs""".stripMargin)),

    // c10's vote is degenerate by fixture (66 bp ASVs fail the 70 %
    // coverage rule → 'None'); this leg pins a NON-degenerate region
    // call end-to-end at the fixture level: five V3–V4 amplicons (exact
    // J01859 substrings, starts 335–347 in the v2–v3 gap, ends at 805
    // in the v4–v5 gap) all pass coverage, every forward vote lands v3
    // and every reverse vote v4, so the majority calls 'v3-v4' through
    // the full load → align → map → vote pipeline. The oracle, like
    // c10's, states the planted verdict (SW is not SQL-expressible —
    // the DP itself is golden-tested against an independent
    // implementation) and recomputes the average length from the FASTA.
    Q("c11_region_inference_positive",
      "per-project region inference on V3-V4 amplicons: majority vote lands 'v3-v4'",
      (s, _) => RegionInference.infer(
        ResultsLoad.load(s, s"$fixtures/longasv", "PRJNA67890")._2)
        .orderBy("project"),
      Some(s"""WITH t AS (SELECT content FROM read_text('$fixtures/longasv/ASVs.fa')),
             |recs AS (SELECT unnest(string_split(content, '>')) AS rec FROM t),
             |fa AS (SELECT
             |    trim(string_split(rec, chr(10))[1]) AS asv,
             |    list_aggregate(list_filter(string_split(rec, chr(10))[2:], x -> x <> ''), 'string_agg', '') AS seq
             |  FROM recs WHERE rec <> ''),
             |tax AS (SELECT column0 AS asv
             |  FROM read_csv('$fixtures/longasv/ASVs_taxonomy.tsv', delim='\t', header=true)),
             |seqs AS (SELECT seq FROM fa WHERE asv <> '' AND asv IN (SELECT asv FROM tax))
             |SELECT 'PRJNA67890' AS project, 'v3-v4' AS region,
             |  (sum(length(seq))::DOUBLE / count(*)::DOUBLE) AS length
             |FROM seqs""".stripMargin)),

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
      },
      Some(s"""WITH s AS (SELECT src FROM read_csv('$fixtures/sources.txt', delim='', header=false, columns={'src':'VARCHAR'}))
             |SELECT src,
             |  ((src LIKE '%fec%' OR src LIKE '%faec%' OR src LIKE '%stool%' OR src LIKE '%2003%' OR src LIKE '%meconium%')
             |   AND NOT (src LIKE '%cultur%' OR src LIKE '%swab%' OR src LIKE '%incubat%' OR src LIKE '%rectum%'
             |        OR src LIKE '%rectal%' OR src LIKE '%virus%' OR src LIKE '%tissue%' OR src LIKE '%soil%')) AS keep
             |FROM s ORDER BY src""".stripMargin))
  )
}
