package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** graft_md5_prefix60 replaces Portable.h60's composed
  * `conv(substring(md5(x),1,15),16,10)::LONG` in r18 — this pins the
  * bit-identity the 81 call sites (and their DuckDB oracle twins) rest
  * on, over ASCII, unicode, empties, long strings and nulls, through
  * BOTH the codegen and interpreted paths.
  */
class Md5Prefix60Spec extends SparkTestBase {
  import graft.functions.Portable.h60

  private def composed(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  test("bit-identical to the conv/substring/md5 composition") {
    val df = spark.range(5000).selectExpr(
      """concat('doc ', id, ' tök™ ', repeat('αβ𝔘', cast(id % 7 as int)),
        | case when id % 11 = 0 then '' else ' tail' end) as s""".stripMargin)
      .union(spark.sql("select '' as s"))
      .union(spark.sql("select cast(null as string) as s"))
    val rows = df.select(col("s"), h60(col("s")).as("fast"),
      composed(col("s")).as("slow")).collect()
    assert(rows.length == 5002)
    rows.foreach { r =>
      if (r.isNullAt(1) || r.isNullAt(2))
        assert(r.isNullAt(1) && r.isNullAt(2), s"null drift: $r")
      else {
        assert(r.getLong(1) == r.getLong(2), s"value drift: $r")
        assert(r.getLong(1) >= 0L && r.getLong(1) < (1L << 60))
      }
    }
  }

  test("interpreted (non-codegen) eval agrees with codegen") {
    val s = org.apache.spark.unsafe.types.UTF8String.fromString("graft µ 💡")
    val viaEval = graft.plans.Md5Prefix60(
      org.apache.spark.sql.catalyst.expressions.Literal(s,
        org.apache.spark.sql.types.StringType)).eval(null)
    val viaDf = spark.sql("select 'graft µ 💡' as s")
      .select(h60(col("s"))).head().getLong(0)
    assert(viaEval == viaDf)
  }
}
