package graft.operators

import graft.SparkTestBase
import graft.functions.Kernels

/** t42's two claims, pinned:
  *
  *   1. [[Kernels.mergePass]] is ONE greedy left-to-right non-overlapping
  *      pass — the exact semantics of the oracle's sequential replace()
  *      on the delimited-string form (the t25-pinned equivalence, here
  *      for arbitrary merged tokens, not just codepoints).
  *   2. NON-VACUITY of iteration: on the committed corpus, t42's
  *      recount-after-each-merge ranking genuinely DIVERGES from t22's
  *      one-shot raw-count ranking — the rounds agree exactly while the
  *      adopted pairs are disjoint (identical counts, so iteration is
  *      provably not changing what it shouldn't) and split once adopted
  *      merges have consumed enough adjacencies to demote a one-shot
  *      favorite. Without this, "iterated BPE" could silently degenerate
  *      to re-ranking the same counts eight times.
  */
class BpeIteratedSpec extends SparkTestBase {

  test("mergePass: greedy left-to-right, non-overlapping, no rescan of merged output") {
    // overlapping run: [a,a,a] under (a,a) -> [aa,a], never [a,aa]
    assert(Kernels.mergePass(Array("a", "a", "a"), "a", "a").toSeq
      === Seq("aa", "a"))
    // two disjoint occurrences both merge in the one pass
    assert(Kernels.mergePass(Array("a", "b", "c", "a", "b"), "a", "b").toSeq
      === Seq("ab", "c", "ab"))
    // the merged output is not rescanned: [a,a,b] under (a,b)?
    // only the adjacent pair merges; the 'a' before it survives
    assert(Kernels.mergePass(Array("a", "a", "b"), "a", "b").toSeq
      === Seq("a", "ab"))
    // multi-codepoint tokens merge as whole units — ('ab','c') is not
    // confused with ('a','bc')
    assert(Kernels.mergePass(Array("ab", "c", "a", "bc"), "ab", "c").toSeq
      === Seq("abc", "a", "bc"))
    assert(Kernels.mergePass(Array("ab", "c", "a", "bc"), "a", "bc").toSeq
      === Seq("ab", "c", "abc"))
    // no occurrence: identity
    assert(Kernels.mergePass(Array("x", "y"), "a", "b").toSeq
      === Seq("x", "y"))
  }

  test("iterated ranking diverges from the one-shot ranking on the corpus (non-vacuity of recounting)") {
    val sf = "/root/testdata/sf0.001"
    val iterated = graft.SparkEntry.queries("t42_bpe_iterated_train")(spark, sf)
      .collect()
      .map(r => (r.getAs[String]("merge_left") + r.getAs[String]("merge_right"),
        r.getAs[Long]("pair_count")))
      .toSeq
    val oneShot = graft.SparkEntry.queries("t22_bpe_pairs")(spark, sf)
      .collect()
      .map(r => (r.getAs[String]("pair"), r.getAs[Long]("pair_count")))
      .toSeq
      .take(iterated.length)
    assert(iterated.nonEmpty && iterated.length === 8)
    // round 1 MUST agree: before any merge the two countings are
    // identical by construction (codepoint pairs weighted by frequency)
    assert(iterated.head === oneShot.head,
      "round 1 counts nothing but raw codepoint pairs — any difference is a bug")
    // ...and the sequences must SPLIT within the 8 rounds: adopted
    // merges consume pair occurrences, so a one-shot favorite whose
    // letters overlap earlier winners gets demoted on recount
    assert(iterated !== oneShot,
      "iterated == one-shot across all 8 rounds: recounting is vacuous on this corpus")
    val firstDiff = iterated.zip(oneShot).indexWhere { case (a, b) => a != b }
    assert(firstDiff >= 1,
      s"divergence must come from recounting, not round-1 counting (at $firstDiff)")
    // and iteration composes merges one-shot cannot even express: some
    // adopted pair has a side longer than one codepoint (a previously
    // merged token)
    val multi = graft.SparkEntry.queries("t42_bpe_iterated_train")(spark, sf)
      .collect()
      .exists(r => r.getAs[String]("merge_left").codePointCount(0,
        r.getAs[String]("merge_left").length) > 1 ||
        r.getAs[String]("merge_right").codePointCount(0,
          r.getAs[String]("merge_right").length) > 1)
    assert(multi,
      "8 rounds adopted only codepoint pairs — true iteration would have " +
        "begun composing merged tokens on this corpus")
  }

  test("t43 curve bounds: codepoint floor at round 0, strict decrease per adopted merge, decrement <= that merge's pair count") {
    val sf = "/root/testdata/sf0.001"
    val curve = graft.SparkEntry.queries("t43_bpe_compression_curve")(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("round"), r.getAs[Long]("total_tokens"),
        r.getAs[Long]("total_chars"), r.getAs[Double]("chars_per_token")))
      .sortBy(_._1)
    val merges = graft.SparkEntry.queries("t42_bpe_iterated_train")(spark, sf)
      .collect()
      .map(r => r.getAs[Long]("round") -> r.getAs[Long]("pair_count")).toMap
    assert(curve.length === 9, "rounds 0..8")
    // round 0 is the codepoint floor: every token is one codepoint
    assert(curve.head._2 === curve.head._3 && curve.head._4 === 1.0)
    curve.sliding(2).foreach { case Array((r0, t0, _, _), (r1, t1, _, cpt1)) =>
      merges.get(r1) match {
        case Some(cnt) =>
          // a greedy pass replaces at least one and at most `cnt`
          // occurrences (overlapping pairs share tokens), each replacement
          // removing exactly one token
          assert(t1 < t0, s"round $r1 adopted a merge but tokens did not drop")
          assert(t0 - t1 <= cnt,
            s"round $r1 removed ${t0 - t1} tokens > its pair count $cnt")
        case None =>
          assert(t1 === t0, s"round $r1 adopted nothing — curve must be flat")
      }
      assert(cpt1 === curve.head._3.toDouble / t1)
    }
  }
}
