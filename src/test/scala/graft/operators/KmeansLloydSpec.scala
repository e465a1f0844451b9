package graft.operators

import graft.SparkTestBase
import graft.core.Tables
import graft.functions.Portable.{dotFast, vecD}
import org.apache.spark.sql.functions.{col, sqrt}

/** s26 iterated Lloyd (spherical k-means) — the claims the oracle hash
  * can't see: the spherical objective's round-over-round monotonicity,
  * mass conservation, convergence on a planted corpus, and non-vacuity
  * of the iteration (round 2 genuinely reassigns vectors on the real
  * fixture, so the iterated build is not s04's one-shot in disguise).
  */
class KmeansLloydSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  private def planted(n: Int, kPlanted: Int) = {
    import spark.implicits._
    graft.plans.VectorExpressions.register(spark)
    val rnd = new scala.util.Random(11L)
    val rows = (0 until n).map { i =>
      val c = i % kPlanted
      val v = Array.tabulate(64) { k =>
        (if (k == c) 1.0 else 0.0) + 0.2 * (rnd.nextDouble() * 2 - 1)
      }
      (i.toLong, v)
    }
    rows.toDF("vec_id", "v")
      .withColumn("nrm", sqrt(dotFast(col("v"), col("v"))))
  }

  test("s26 planted corpus: objective non-decreasing, mass conserved, final sizes = the planted partition") {
    val (report, obj) = Similarity.lloydRounds(planted(90, 3), k = 3, rounds = 3)
    val rows = report.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long])))
    // spherical Lloyd: assignment improves the objective holding
    // centroids, the mean direction improves it holding assignment —
    // the assignment-time curve may never drop (float-sum slack only)
    assert(obj.zip(obj.tail).forall { case (a, b) => b >= a - 1e-9 },
      s"objective regressed: $obj")
    // every round partitions the corpus: sizes sum to n at each round
    (1L to 3L).foreach { r =>
      assert(rows.filter(_._1 == r).map(_._3).sum === 90L,
        s"round $r mass not conserved")
    }
    // round 1 has no previous assignment — arrivals are NULL, not 0
    assert(rows.filter(_._1 == 1L).forall(_._4.isEmpty))
    assert(rows.filter(_._1 > 1L).forall(_._4.isDefined))
    // seeds 0/1/2 land one per planted cluster, separation >> noise:
    // the build must converge to the planted 30/30/30 partition
    assert(rows.filter(_._1 == 3L).map(_._3).toSeq.sorted === Seq(30L, 30L, 30L))
    // and once converged, the last round moves nothing
    assert(rows.filter(_._1 == 3L).flatMap(_._4).sum === 0L)
  }

  test("s26 fixture: iteration is non-vacuous — round 2 genuinely reassigns vectors from the Forgy seeds") {
    graft.plans.VectorExpressions.register(spark)
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), vecD(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(dotFast(col("v"), col("v"))))
    val (report, obj) = Similarity.lloydRounds(vecs, k = 8, rounds = 3)
    val rows = report.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long])))
    val n = vecs.count()
    (1L to 3L).foreach { r =>
      assert(rows.filter(_._1 == r).map(_._3).sum === n,
        s"round $r mass not conserved")
    }
    assert(obj.zip(obj.tail).forall { case (a, b) => b >= a - 1e-9 },
      s"objective regressed: $obj")
    val moved2 = rows.filter(_._1 == 2L).flatMap(_._4).sum
    assert(moved2 > 0L,
      "round 2 moved nothing: the iterated build is vacuously one-shot " +
        "on the fixture — reseed or re-craft")
  }
}
