package graft.operators

import graft.SparkTestBase
import graft.core.Tables
import graft.functions.Portable.{dotFast, vecD}
import org.apache.spark.sql.functions.{col, sqrt}

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

  /** 200 16-dim vectors in 40 TIGHT five-member blobs for the s28
    * recall curve: blob b = i % 40 is one-hot (b % 8) in subspace 0 and
    * one-hot (b / 8) in subspace 1 (patterns 0–4 of 8). A CORRECT
    * product quantizer puts each blob in its own (8 × 8)-cell, so ADC
    * top-5 finds the 4 blob-mates; the Forgy seeds (vec_ids 0–7 =
    * blobs 0–7) cover only subspace-1 pattern 0, so the round-1
    * codebook starts blind to patterns 1–4 and only iteration spreads
    * codewords to them — the curve has real ground to gain.
    */
  private def plantedTight(n: Int = 200) = {
    import spark.implicits._
    graft.plans.VectorExpressions.register(spark)
    val rnd = new scala.util.Random(27L)
    val rows = (0 until n).map { i =>
      val b = i % 40
      val v = Array.tabulate(16) { d =>
        val signal =
          if (d < 8) { if (d == b % 8) 1.0 else 0.0 }
          else { if (d - 8 == b / 8) 1.0 else 0.0 }
        signal + 0.1 * (rnd.nextDouble() * 2 - 1)
      }
      (i.toLong, v)
    }
    rows.toDF("vec_id", "v")
      .withColumn("nrm", sqrt(dotFast(col("v"), col("v"))))
  }

  test("s28 planted corpus: training helps — degenerate Forgy seeds recover the planted cells and recall rises") {
    val out = Similarity.pqTrainRecall(plantedTight(),
      m = 2, subDim = 8, k = 8, rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    // query grid: vec_id % 50 == 0 below 2000 → 4 queries × 3 rounds
    assert(out.length === 12, s"grid incomplete: ${out.length} rows")
    def mean(r: Long): Double = {
      val xs = out.filter(_._2 == r).map(_._4)
      xs.sum / xs.length
    }
    info(s"planted recall curve: r1=${mean(1)} r2=${mean(2)} r3=${mean(3)}")
    assert(mean(3L) >= mean(1L),
      s"training regressed recall: r1=${mean(1L)} r3=${mean(3L)}")
    assert(mean(3L) >= 0.5,
      s"trained codebook fails to recover the planted cells: ${mean(3L)}")
  }

  test("s28 real fixture: grid complete, hits bounded, recall consistent, curve not flat") {
    graft.plans.VectorExpressions.register(spark)
    val vecs = Tables.embeddings(spark, "/root/testdata/sf0.01")
      .select(col("vec_id"), vecD(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(dotFast(col("v"), col("v"))))
    val out = Similarity.pqTrainRecall(vecs, m = 4, subDim = 16,
      k = 16, rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    val queries = out.map(_._1).distinct
    assert(queries.nonEmpty, "empty query grid on the real fixture")
    assert(out.length === queries.length * 3, "missing (query, round) rows")
    assert(out.forall(t => t._3 >= 0L && t._3 <= 5L), "hits out of [0,5]")
    assert(out.forall(t => t._4 == t._3 / 5.0), "recall != n_hits/5")
    val byRound = (1L to 3L).map(r =>
      out.filter(_._2 == r).map(t => t._1 -> t._3).toMap)
    assert(byRound.distinct.size > 1,
      "identical ADC hits at every round: the per-round encode is " +
        "vacuously one-shot on the fixture")
  }

  test("PQ scan refuses a vector whose length differs from the codebook dim — interpreted and codegen paths") {
    import spark.implicits._
    graft.plans.VectorExpressions.register(spark)
    // a 2×2 codebook (labels 7, 8); a 3-dim input must FAIL, not score a
    // prefix into a plausible-but-wrong label — the per-row mirror of
    // checkPq's literal-codebook shape check
    val cents = IndexedSeq(1.0, 0.0, 0.0, 1.0)
    val labels = IndexedSeq(7L, 8L)
    val hns = IndexedSeq(0.5, 0.5)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val bad = graft.plans.PqArgLabelD(
      Literal.create(Seq(1.0, 2.0, 3.0), ArrayType(DoubleType)),
      cents, labels, hns)
    val e1 = intercept[IllegalArgumentException] { bad.eval(null) }
    assert(e1.getMessage.contains("codebook dim"), e1.getMessage)
    // the matched length still scans (both paths)
    val ok = graft.plans.PqArgLabelD(
      Literal.create(Seq(1.0, 0.0), ArrayType(DoubleType)),
      cents, labels, hns)
    assert(ok.eval(null) === 7L)
    // codegen path through the SQL registration
    val sql = (v: String) => Seq(1).toDF("ignore").selectExpr(
      s"graft_pq_label($v, array(1.0D, 0.0D, 0.0D, 1.0D), " +
        "array(7L, 8L), array(0.5D, 0.5D)) AS l")
    assert(sql("array(1.0D, 0.0D)").collect().map(_.getLong(0)).toSeq
      === Seq(7L))
    val e2 = intercept[Throwable] { sql("array(1.0D, 2.0D, 3.0D)").collect() }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(causes(e2).exists(c =>
      Option(c.getMessage).exists(_.contains("codebook dim"))),
      s"codegen path scored a mis-sized vector: $e2")
  }
}
