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
