package graft.operators

import graft.SparkTestBase
import graft.core.Tables
import graft.functions.Portable.vecD
import org.apache.spark.sql.functions.col

/** s27 PQ codebook training — the claims the oracle hash can't see:
  * the L2 objective's round-over-round descent (via the equivalent
  * Σ max(x·c − ½|c|²) non-decrease), mass conservation per
  * (round, subspace), non-vacuity of the iteration on the real
  * fixture, and — the property that makes it PRODUCT quantization —
  * that subspaces train independently: a corpus clustered differently
  * per subspace must converge to different per-subspace partitions.
  */
class PqCodebookSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  /** 40 8-dim vectors, m=2 subspaces of 4 dims with DIFFERENT planted
    * structure: subspace 0 splits 10/30 (blob by i % 4 == 0), subspace
    * 1 splits 20/20 (blob by i % 2). Seeds 0 and 1 land one per blob
    * in BOTH subspaces, so k=2 Lloyd converges to the planted
    * partition of each subspace independently.
    */
  private def planted(n: Int = 40) = {
    import spark.implicits._
    graft.plans.VectorExpressions.register(spark)
    val rnd = new scala.util.Random(27L)
    val rows = (0 until n).map { i =>
      val b0 = if (i % 4 == 0) 0 else 1 // 10 / 30
      val b1 = i % 2 //                    20 / 20
      val v = Array.tabulate(8) { d =>
        val signal =
          if (d < 4) { if (d == b0) 1.0 else 0.0 }
          else { if (d - 4 == b1) 1.0 else 0.0 }
        signal + 0.15 * (rnd.nextDouble() * 2 - 1)
      }
      (i.toLong, v)
    }
    rows.toDF("vec_id", "v")
  }

  test("planted corpus: subspaces train APART — each converges to its own partition; objective descends; mass conserved") {
    val (report, obj) = Similarity.pqCodebookRounds(planted(),
      m = 2, subDim = 4, k = 2, rounds = 3)
    val rows = report.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Long])))
    // Σ max-score non-decreasing ⇔ SSE non-increasing (|x−c|² =
    // |x|² − 2·score, Σ|x|² constant): assignment improves holding
    // centroids, the mean improves holding assignment
    assert(obj.zip(obj.tail).forall { case (a, b) => b >= a - 1e-9 },
      s"L2 objective regressed: $obj")
    // every round partitions every subspace's corpus copy
    for (r <- 1L to 3L; sub <- 0L to 1L) {
      assert(rows.filter(t => t._1 == r && t._2 == sub).map(_._4).sum === 40L,
        s"round $r sub $sub mass not conserved")
    }
    // round 1 has no previous assignment — arrivals NULL, not 0
    assert(rows.filter(_._1 == 1L).forall(_._5.isEmpty))
    assert(rows.filter(_._1 > 1L).forall(_._5.isDefined))
    // the PRODUCT property: final sizes match each subspace's OWN
    // planted split — identical codebooks could not produce both
    val fin = (sub: Long) => rows.filter(t => t._1 == 3L && t._2 == sub)
      .map(_._4).sorted.toSeq
    assert(fin(0L) === Seq(10L, 30L), s"sub 0 missed its planted 10/30: ${fin(0L)}")
    assert(fin(1L) === Seq(20L, 20L), s"sub 1 missed its planted 20/20: ${fin(1L)}")
    // converged: the last round moves nothing
    assert(rows.filter(_._1 == 3L).flatMap(_._5).sum === 0L)
  }

  test("real fixture: iteration is non-vacuous — round 2 reassigns subvectors from the Forgy seeds") {
    graft.plans.VectorExpressions.register(spark)
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), vecD(col("embedding")).as("v"))
    val (report, obj) = Similarity.pqCodebookRounds(vecs,
      m = 4, subDim = 16, k = 4, rounds = 3)
    val rows = report.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Long])))
    val n = vecs.count()
    for (r <- 1L to 3L; sub <- 0L to 3L) {
      assert(rows.filter(t => t._1 == r && t._2 == sub).map(_._4).sum === n,
        s"round $r sub $sub mass not conserved")
    }
    assert(obj.zip(obj.tail).forall { case (a, b) => b >= a - 1e-9 },
      s"L2 objective regressed: $obj")
    val moved2 = rows.filter(_._1 == 2L).flatMap(_._5).sum
    assert(moved2 > 0L,
      "round 2 moved nothing: the iterated codebook build is vacuously " +
        "one-shot on the fixture — reseed or re-craft")
  }
}
