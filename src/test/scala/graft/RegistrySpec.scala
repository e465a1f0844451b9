package graft

import org.scalatest.funsuite.AnyFunSuite

/** Meta-guards on the driver contract itself: the registry is the
  * correctness gate's input, so structural slips here (a duplicate name
  * silently shadowing a query in the Map, an operator registered without
  * its oracle) would weaken every downstream check without failing any
  * operator spec.
  */
class RegistrySpec extends AnyFunSuite {

  test("registry names are unique — no query can shadow another in the queries Map") {
    val names = SparkEntry.registry.map(_.name)
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate registry names: ${dups.mkString(", ")}")
    assert(names.size === SparkEntry.queries.size)
  }

  test("every registry query carries a DuckDB oracle — the hash gate covers the full surface") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty,
      s"queries without an oracle (driver falls back to rows-only): ${missing.mkString(", ")}")
  }

  test("every oracle pins its output order — a missing ORDER BY would hash nondeterministically") {
    // the driver's compare hashes sorted values, but a Spark result
    // whose own ordering is unpinned can still float (window ties,
    // partition order), so every query body ends in orderBy and every
    // oracle must end in ORDER BY — this guards the oracle half
    // single-ROW outputs (global aggregates, no GROUP BY) cannot float:
    // each is consciously listed here, so a future orderless oracle
    // still fails loudly unless it argues its way onto this list
    val singleRow = Set("c01_qc_decision", "c10_region_inference",
      "c11_region_inference_positive", "d20_lsh_recall_audit",
      "q02_count_distinct")
    val bad = (SparkEntry.oracleSql -- singleRow).filterNot { case (_, sql) =>
      sql.toUpperCase.replaceAll("\\s+", " ").contains("ORDER BY")
    }.keys
    assert(bad.isEmpty, s"oracles without ORDER BY: ${bad.mkString(", ")}")
    // and the allowlist itself can't rot: every listed query must exist
    // and genuinely lack an ORDER BY
    singleRow.foreach { q =>
      assert(SparkEntry.oracleSql.contains(q), s"stale allowlist entry: $q")
      assert(!SparkEntry.oracleSql(q).toUpperCase.contains("ORDER BY"),
        s"$q now has ORDER BY — remove it from the allowlist")
    }
  }

  test("names are stable machine identifiers (snake_case prefix families)") {
    val pat = "^[a-z][a-z0-9]*(_[a-z0-9]+)+$".r
    val bad = SparkEntry.registry.map(_.name).filterNot(n => pat.matches(n))
    assert(bad.isEmpty, s"non-conforming names: ${bad.mkString(", ")}")
  }

  test("staticSchema is declared only for driver-side queries (conscious-review allowlist)") {
    // a declared schema bypasses the live `.schema` check below, so every
    // declaration must argue its way onto this list — the singleRow
    // allowlist discipline; plan-pure queries must NOT declare one
    val driverSide = Set("c12_stream_replay", "c13_stream_ingest_replay",
      "c14_cdc_partitioned", "c15_stream_replay_partitioned",
      "c16_stream_funnel_stateful", "c17_stream_transitions_stateful",
      "c18_stream_sessionize_stateful", "c19_stream_dedup_native",
      "c20_stream_window_latedrop", "c21_stream_stream_join",
      "c22_stream_forget_replay", "c23_stream_replay_manifest",
      "c24_stream_join_ivm", "c25_stream_agg_join_ivm",
      "c26_stream_file_source", "c27_stream_clustered_cdc",
      "c28_stream_outer_join", "c29_time_travel_read",
      "t41_temperature_mix",
      "t42_bpe_iterated_train", "t43_bpe_compression_curve",
      "s25_knn_descent_rounds", "s26_kmeans_lloyd_rounds",
      "s27_pq_codebook_train", "s28_pq_train_recall")
    val declared = SparkEntry.registry.filter(_.staticSchema.isDefined)
      .map(_.name).toSet
    assert(declared === driverSide,
      s"staticSchema allowlist drift: unexpected ${declared -- driverSide}, " +
        s"missing ${driverSide -- declared}")
  }

  /** Output columns the oracle SQL pins to an integer type (`::BIGINT AS x`
    * / `CAST(... AS BIGINT) AS x` — the repo's convention for every integer
    * output). The driver's hash renders values as text, so a Spark DOUBLE
    * against an oracle BIGINT ('5.0' vs '5') hash-mismatches even when the
    * values are numerically equal — round 11's one red row (q47) was
    * exactly this, and the value-only local gate let it reach the driver.
    */
  private def intPinnedAliases(sql: String): Set[String] = {
    val pat = ("(?i)(?:::\\s*(?:BIGINT|INTEGER|INT)\\b|" +
      "AS\\s+(?:BIGINT|INTEGER|INT)\\s*\\))\\s*AS\\s+([a-zA-Z_][a-zA-Z0-9_]*)").r
    pat.findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
  }

  private def integral(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt == ByteType || dt == ShortType || dt == IntegerType || dt == LongType
  }

  test("detector: a planted float column against an int-pinned oracle alias is flagged") {
    assert(intPinnedAliases(
      "SELECT count(*)::BIGINT AS n, CAST(sum(x) AS BIGINT) AS total, avg(y) AS m FROM t")
      === Set("n", "total"))
    val spark = TestSpark.spark
    val df = spark.sql("SELECT CAST(1.0 AS DOUBLE) AS n")
    val drift = df.schema.fields.filter(f =>
      intPinnedAliases("SELECT 1::BIGINT AS n") contains f.name.toLowerCase)
      .filterNot(f => integral(f.dataType))
    assert(drift.nonEmpty, "planted float-vs-BIGINT drift must be caught")
  }

  test("every oracle-int-pinned output column is integral in the Spark schema (the q47 drift class)") {
    val spark = TestSpark.spark
    val sf = "/root/testdata/sf0.001"
    val offenders = SparkEntry.registry.flatMap { q =>
      q.oracle.toSeq.flatMap { sql =>
        val pinned = intPinnedAliases(sql)
        // plan-pure queries: `.schema` is analysis only, no execution —
        // cheap even registry-wide. Driver-side queries (streaming
        // replays, warehouse round-trips, eager checkpoints) EXECUTE on
        // `.schema`, so they declare a staticSchema instead; a declared
        // schema that drifts from reality is still caught by the driver
        // gate, which hashes the real output's columns every round.
        // Aliases pinned inside CTEs but absent from the final output are
        // ignored (only the emitted schema can drift at the driver).
        val schema = q.staticSchema.getOrElse {
          try q.run(spark, sf).schema
          catch { case e: Throwable =>
            fail(s"${q.name}: query failed to analyze at $sf: ${e.getMessage}")
          }
        }
        schema.fields.toSeq
          .filter(f => pinned.contains(f.name.toLowerCase))
          .filterNot(f => integral(f.dataType))
          .map(f => s"${q.name}.${f.name}: spark ${f.dataType.simpleString} vs oracle integer")
      }
    }
    assert(offenders.isEmpty,
      s"float-vs-int dtype drift (driver hash would mismatch):\n  ${offenders.mkString("\n  ")}")
  }
}
