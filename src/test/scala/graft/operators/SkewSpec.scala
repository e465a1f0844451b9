package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SkewSpec extends SparkTestBase {
  import spark.implicits._

  test("saltedJoin equals the plain join as a multiset, including dup dim keys") {
    // hot key 1 (80% of fact rows), dim with a duplicated key to prove
    // per-pair multiplicity survives salting
    val fact = (1 to 500).map(i => (if (i % 5 == 0) i.toLong % 7 else 1L, i))
      .toDF("k", "payload")
    val dim = Seq((1L, "a"), (1L, "a2"), (2L, "b"), (3L, "c"), (6L, "f"))
      .toDF("k", "attr")
    val plain = fact.join(dim, Seq("k")).select("k", "payload", "attr")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .sorted.toSeq
    val salted = Skew.saltedJoin(fact, dim, "k", salts = 4)
      .select("k", "payload", "attr")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .sorted.toSeq
    assert(salted === plain)
  }

  test("d03 band-bucket self-join: AQE splits a planted hot bucket") {
    // d03's claimed 100 TB safety is that the band self-join never
    // degenerates to one reducer on a hot bucket. Reproduce the hazard at
    // test scale: half the docs share ONE band key, AQE skew-join
    // thresholds lowered so the hot partition qualifies, then assert the
    // executed SMJ is actually marked skew=true (i.e. the hot bucket was
    // split across reducers, not serialized onto one).
    val overrides = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = overrides.map { case (k, _) =>
      k -> scala.util.Try(spark.conf.get(k)).toOption }
    overrides.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val n = 20000
      // same shape as d03's candidate stage: (doc_id, bkey) self-joined on
      // bkey; bucket 0 holds a tenth of the corpus (2000² candidate pairs)
      val bands = spark.range(n.toLong).select(col("id").as("doc_id"),
        when(col("id") % 10 === 0, lit(0L))
          .otherwise(xxhash64(col("id"))).as("bkey"))
      val cand = bands.as("x").join(bands.as("y"), Seq("bkey"))
        .filter(col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        // post-join thinning so collect() doesn't pull the full 2M-pair
        // hot-bucket output to the driver. Must be NON-equi: an equality
        // filter would be promoted to a join key, re-spreading the planted
        // hot bucket and defeating the test
        .filter(col("doc_b") - col("doc_a") <= 10)
      // collect() (not count()) so THIS frame's queryExecution finalizes —
      // count() builds its own plan and leaves cand's adaptive plan initial
      cand.collect()
      val plan = cand.queryExecution.executedPlan.toString
      val cut = plan.indexOf("== Initial Plan ==")
      val finalPlan = if (cut >= 0) plan.substring(0, cut) else plan
      assert(finalPlan.contains("skew=true"),
        s"hot band bucket must trigger AQE skew-join split, got:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("d02/d07 shingle pair join: AQE splits a planted hot shingle AND reuses one exchange") {
    // The 100 TB hazard d02's comment reasons about: one boilerplate
    // shingle in a tenth of the corpus would serialize the pair join onto
    // one reducer. Reproduce jaccardPairs' EXACT shape — same frame
    // merge-hint self-joined on the shingle with NO explicit repartition
    // — and assert the two properties that shape buys together: AQE
    // skew-split fires on the hot shingle, and both sides still read ONE
    // reused exchange. (An explicit repartition(col("shingle")) keeps
    // the reuse but its REPARTITION_BY_COL origin makes
    // OptimizeSkewedJoin refuse the split — probe-verified, which is why
    // jaccardPairs doesn't pre-partition.)
    val overrides = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = overrides.map { case (k, _) =>
      k -> scala.util.Try(spark.conf.get(k)).toOption }
    overrides.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val n = 20000
      val ex = spark.range(n.toLong).select(col("id").as("doc_id"),
        lit(10L).as("nsh"),
        when(col("id") % 10 === 0, lit(0L))
          .otherwise(xxhash64(col("id"))).as("shingle"))
      val a = ex.select(col("doc_id").as("doc_a"), col("nsh").as("size_a"), col("shingle"))
      val b = ex.select(col("doc_id").as("doc_b"), col("nsh").as("size_b"), col("shingle"))
      val pairs = a.hint("merge").join(b, Seq("shingle"))
        .filter(col("doc_a") < col("doc_b"))
        // post-join thinning so collect() doesn't pull the hot bucket's
        // 2M pairs to the driver; NON-equi so it can't become a join key
        .filter(col("doc_b") - col("doc_a") <= 10)
      pairs.collect()
      val plan = pairs.queryExecution.executedPlan.toString
      val cut = plan.indexOf("== Initial Plan ==")
      val finalPlan = if (cut >= 0) plan.substring(0, cut) else plan
      assert(finalPlan.contains("skew=true"),
        s"hot shingle must trigger AQE skew-join split, got:\n$finalPlan")
      assert(finalPlan.contains("ReusedExchange"),
        s"the self-join must still read one exchange:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("q30 salted join plan carries the salt in the join keys") {
    val df = graft.SparkEntry.queries("q30_salted_join")(
      spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val cut = plan.indexOf("== Initial Plan ==")
    val finalPlan = if (cut >= 0) plan.substring(0, cut) else plan
    assert(finalPlan.contains("__salt"),
      "salt column must participate in the physical join")
  }
}
