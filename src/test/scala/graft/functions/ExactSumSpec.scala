package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Portable.exactSumDbl/Dec replace `sum(cast(v AS DECIMAL(18,s)))` in the
  * r18 optimization round (per-row LONG aggregate instead of a
  * DECIMAL(28,s) accumulator). These specs pin the bit-identity contract
  * the rewrite rests on — grouped doubles, decimal-typed outputs, negative
  * values, >2^53 magnitudes (where a naive `/ 10.0^s` would double-round),
  * and null/empty-group propagation.
  */
class ExactSumSpec extends SparkTestBase {
  import graft.functions.Portable.{exactSumDbl, exactSumDec}

  private def bits(d: Double): Long = java.lang.Double.doubleToRawLongBits(d)

  test("exactSumDbl is bit-identical to the decimal(18,s) sum incl. negatives") {
    import spark.implicits._
    // 2dp money values, mixed sign, many groups
    val df = spark.range(20000).select(
      (col("id") % 37).as("g"),
      ((col("id").cast("double") - 10000.0) * 1.23).as("v2"),
      ((col("id").cast("double") % 977.0) * 0.0137).as("v4"))
      .selectExpr("g", "round(v2, 2) as v2", "round(v4, 4) as v4")
    val dec = df.groupBy("g").agg(
      sum(col("v2").cast("decimal(18,2)")).cast("double").as("s2"),
      sum(col("v4").cast("decimal(18,4)")).cast("double").as("s4"))
      .orderBy("g").collect()
    val lng = df.groupBy("g").agg(
      exactSumDbl(col("v2"), 2).as("s2"),
      exactSumDbl(col("v4"), 4).as("s4"))
      .orderBy("g").collect()
    assert(dec.length == lng.length && dec.nonEmpty)
    dec.zip(lng).foreach { case (a, b) =>
      assert(bits(a.getDouble(1)) == bits(b.getDouble(1)), s"s2: $a vs $b")
      assert(bits(a.getDouble(2)) == bits(b.getDouble(2)), s"s4: $a vs $b")
    }
  }

  test("exactSumDec keeps the DECIMAL(28,s) dtype and exact values") {
    val df = spark.range(5000).select(
      (col("id") % 7).as("g"),
      ((col("id").cast("double") - 2500.0) * 3.31).as("v"))
      .selectExpr("g", "round(v, 2) as v")
    val dec = df.groupBy("g")
      .agg(sum(col("v").cast("decimal(18,2)")).as("s"))
    val lng = df.groupBy("g").agg(exactSumDec(col("v"), 2).as("s"))
    assert(dec.schema("s").dataType == DecimalType(28, 2))
    assert(lng.schema("s").dataType == DecimalType(28, 2))
    val a = dec.orderBy("g").collect(); val b = lng.orderBy("g").collect()
    a.zip(b).foreach { case (x, y) =>
      assert(x.getDecimal(1) == y.getDecimal(1), s"$x vs $y")
    }
  }

  test("single decimal unscale rounds once above 2^53 (no double rounding)") {
    // group sums land above 2^53 scaled units: long->double cast is lossy
    // there, so the helper's decimal division is load-bearing
    val df = spark.range(2000).select(
      (col("id") % 3).as("g"),
      ((col("id").cast("double") + 1.0) * 91234567890.12).as("v"))
      .selectExpr("g", "round(v, 2) as v")
    val dec = df.groupBy("g")
      .agg(sum(col("v").cast("decimal(18,2)")).cast("double").as("s"))
      .orderBy("g").collect()
    val lng = df.groupBy("g").agg(exactSumDbl(col("v"), 2).as("s"))
      .orderBy("g").collect()
    dec.zip(lng).foreach { case (a, b) =>
      assert(bits(a.getDouble(1)) == bits(b.getDouble(1)), s"$a vs $b")
    }
  }

  test("null propagation matches sum(decimal): all-null group is null") {
    val df = spark.sql(
      """select * from values (0L, cast(null as double)), (0L, null),
        |  (1L, 2.50d), (1L, null) as t(g, v)""".stripMargin)
    val dec = df.groupBy("g")
      .agg(sum(col("v").cast("decimal(18,2)")).cast("double").as("s"))
      .orderBy("g").collect()
    val lng = df.groupBy("g").agg(exactSumDbl(col("v"), 2).as("s"))
      .orderBy("g").collect()
    assert(dec(0).isNullAt(1) && lng(0).isNullAt(1))
    assert(bits(dec(1).getDouble(1)) == bits(lng(1).getDouble(1)))
  }
}
