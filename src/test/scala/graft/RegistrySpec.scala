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
}
