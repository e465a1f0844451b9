package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** t44/s29 deletion propagation — the claims the oracle hash can't
  * see: the forget is NON-VACUOUS (erasure genuinely shifts derived
  * statistics and rankings), forgotten members vanish from results, a
  * cluster erased in full DROPS from the centroid store, and the
  * decremented decimal statistics equal an independent exact recompute
  * — the group-property of decimal sums that makes erasure exact. The
  * negative lesson rides along: stores persisting only derived
  * aggregates (a min() canonical, a mean) cannot honor erasure; member
  * grain or group-structured statistics are what make t44/s29
  * possible.
  */
class ForgetSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.01"

  test("t44: erasure shifts rankings (df/avgdl re-derive) and forgotten docs vanish from results") {
    val live = graft.SparkEntry.queries("t32_bm25_store_topk")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    val after = graft.SparkEntry.queries("t44_forget_postings")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(after.nonEmpty, "forgetting must not empty the result")
    assert(live !== after,
      "forgetting changed nothing: N/avgdl/df shifts must move scores " +
        "— the tombstone set is vacuous on this corpus")
    assert(!after.exists(_._3 % 25 == 3),
      "a forgotten doc_id surfaced in the post-erasure rankings")
    // erasure must also shift SCORES of surviving pairs, not merely
    // drop rows: some (query, doc) present in both rankings scores
    // differently (avgdl/df are global statistics)
    val liveScore = live.map(t => (t._1, t._3) -> t._4).toMap
    assert(after.exists(t =>
        liveScore.get((t._1, t._3)).exists(_ != t._4)),
      "no surviving pair rescored: global statistics did not re-derive")
  }

  test("s29: mass conservation — surviving count equals members minus tombstones, and the forget set is nonempty") {
    import spark.implicits._
    val emb = graft.core.Tables.embeddings(spark, sf)
    val members = emb.filter(col("vec_id") % 5 =!= 4).count()
    val gone = emb.filter(col("vec_id") % 5 =!= 4 &&
      col("vec_id") % 7 === 2).count()
    assert(gone > 0, "forget set empty at the gate sf — vacuous")
    val out = graft.SparkEntry.queries("s29_forget_centroids")(spark, sf)
      .filter(col("dim") === 1)
      .select(col("upd_cnt")).as[Long].collect()
    assert(out.sum === members - gone,
      s"mass leak: ${out.sum} != $members - $gone")
  }

  test("s29 planted: a cluster erased in full drops from the store; the decrement equals an exact BigDecimal recompute") {
    import spark.implicits._
    // label 0 members survive (ids 0,1,3 — none ≡ 2 mod 7); label 1's
    // members are ALL tombstoned (ids ≡ 2 mod 7, ≢ 4 mod 5); id 4 is
    // outside the store (≡ 4 mod 5) and must not resurrect anything
    val rows = Seq(
      (0L, 0), (1L, 0), (3L, 0), // survivors, label 0
      (2L, 1), (16L, 1), (23L, 1), (37L, 1), // tombstoned, label 1
      (4L, 0)) // non-member
    val vecs = rows.map { case (id, lab) =>
      (id, Array.tabulate(64)(i => (id * 64 + i).toFloat / 1000f), lab)
    }
    val dir = tmpDir()
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = graft.SparkEntry.queries("s29_forget_centroids")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getDouble(2), r.getLong(3), r.getDouble(4)))
    assert(out.map(_._1).distinct.toSeq === Seq(0L),
      "fully-erased cluster must drop from the store")
    assert(out.forall(_._4 == 3L), "survivor count must be 3")
    // exact recompute: per-dim sum of the survivors' values through the
    // same DECIMAL(18,9) quantization, cast to double once at the end
    val survivors = vecs.filter(v => Seq(0L, 1L, 3L).contains(v._1))
    (1 to 64).foreach { dim =>
      val exact = survivors.map { v =>
        BigDecimal(v._2(dim - 1).toDouble)
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      }.sum
      val got = out.find(_._2 == dim).get
      assert(got._3 === exact.toDouble,
        s"dim $dim decremented sum ${got._3} != exact ${exact.toDouble}")
      assert(got._5 === exact.toDouble / 3L,
        s"dim $dim mean drifted")
    }
  }

  test("d35 planted: an erased canonical re-resolves to the next-min member, a fully-erased hash drops, untouched hashes carry forward") {
    import spark.implicits._
    val dir = tmpDir()
    // three hashes: hA's members {1, 8, 15} (canonical 1 ERASED →
    // must re-resolve to 8); hB's members {2, 9} ALL erased → hash
    // drops; hC's member {3} untouched → carried forward verbatim
    Seq(("hA", 1L), ("hA", 8L), ("hA", 15L),
        ("hB", 2L), ("hB", 9L), ("hC", 3L))
      .toDF("content_hash", "doc_id").write.parquet(s"$dir/members")
    Seq(("hA", 1L), ("hB", 2L), ("hC", 3L))
      .toDF("content_hash", "stored_canonical")
      .write.parquet(s"$dir/canonical")
    val gone = Seq(1L, 2L, 9L).toDF("doc_id")
    val out = Dedup.memberErase(spark, s"$dir/members",
        s"$dir/canonical", gone)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out === Seq(("hA", 8L), ("hC", 3L)),
      s"erasure fold wrong: $out")
    // and the gate-scale invariant: no tombstoned id survives as a
    // canonical anywhere in the d35 output at the gate sf
    val gated = graft.SparkEntry.queries("d35_canonical_erasure")(spark, sf)
      .collect().map(_.getLong(1))
    assert(gated.nonEmpty)
    assert(!gated.exists(id => id % 5 != 4 && id % 7 == 2),
      "a tombstoned doc_id survived as canonical after erasure")
  }
}
