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

  test("names are stable machine identifiers (snake_case prefix families)") {
    val pat = "^[a-z][a-z0-9]*(_[a-z0-9]+)+$".r
    val bad = SparkEntry.registry.map(_.name).filterNot(n => pat.matches(n))
    assert(bad.isEmpty, s"non-conforming names: ${bad.mkString(", ")}")
  }
}
