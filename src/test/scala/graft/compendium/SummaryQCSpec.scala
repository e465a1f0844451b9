package graft.compendium

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SummaryQCSpec extends SparkTestBase {

  test("paired summary.tsv parses to 6 samples with stripped srr") {
    val df = SummaryQC.readSummaryTsv(spark, s"$fixtures/summary_paired.tsv")
    assert(df.count() === 6)
    val srrs = df.select("srr").collect().map(_.getString(0)).sorted
    assert(srrs === (1 to 6).map(i => f"SRR000000$i").toArray)
    assert(df.columns.contains("revse"))
  }

  test("single-end summary.tsv has no revse column") {
    val df = SummaryQC.readSummaryTsv(spark, s"$fixtures/summary_single.tsv")
    assert(!df.columns.contains("revse"))
    assert(df.count() === 3)
  }

  test("sample flags match hand-computed reference semantics") {
    val qc = SummaryQC.sampleQc(
      SummaryQC.readSummaryTsv(spark, s"$fixtures/summary_paired.tsv"))
    val byId = qc.collect().map(r => r.getAs[String]("srr") -> r).toMap
    def flags(srr: String) = {
      val r = byId(srr)
      (r.getAs[Boolean]("retained_warn"), r.getAs[Boolean]("retained_error"),
        r.getAs[Boolean]("chimera_warn"), r.getAs[Boolean]("chimera_error"),
        r.getAs[Boolean]("merged_warn"), r.getAs[Boolean]("merged_error"))
    }
    assert(flags("SRR0000001") === ((false, false, false, false, false, false)))
    assert(flags("SRR0000002") === ((true, false, false, false, false, false)))  // retained 0.65
    assert(flags("SRR0000003") === ((true, true, false, false, true, false)))    // retained 0.5, merged 0.7
    assert(flags("SRR0000004") === ((false, false, true, false, false, false)))  // chimera 0.111
    assert(flags("SRR0000005") === ((true, false, true, true, false, false)))    // chimera 0.25, retained 0.6
    assert(flags("SRR0000006") === ((false, false, false, false, true, true)))   // merged 0.5
  }

  test("project rollup fractions and re_run short-circuit decision") {
    val out = SummaryQC.evaluate(
      spark, s"$fixtures/summary_paired.tsv", "PRJNA12345").collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("sample_count") === 6L)
    assert(r.getAs[Boolean]("paired"))
    assert(math.abs(r.getAs[Double]("retained_warn_frac") - 0.5) < 1e-12)
    assert(math.abs(r.getAs[Double]("retained_error_frac") - 1.0 / 6) < 1e-12)
    assert(math.abs(r.getAs[Double]("chimera_warn_frac") - 2.0 / 6) < 1e-12)
    assert(math.abs(r.getAs[Double]("chimera_error_frac") - 1.0 / 6) < 1e-12)
    assert(math.abs(r.getAs[Double]("merged_warn_frac") - 2.0 / 6) < 1e-12)
    assert(math.abs(r.getAs[Double]("merged_error_frac") - 1.0 / 6) < 1e-12)
    // merged_error_frac 0.1667 > 0.15 ⇒ re_run; discard checks skipped
    // even though retained_warn_frac (0.5) is not above 0.70 anyway
    assert(r.getAs[Boolean]("re_run"))
    assert(!r.getAs[Boolean]("discard"))
    assert(r.getAs[String]("errors") ===
      "16% of samples had ERROR for merged read count.")
  }

  test("single-end project: no merged flags, paired=false") {
    val out = SummaryQC.evaluate(
      spark, s"$fixtures/summary_single.tsv", "PRJNA99999").collect().head
    assert(!out.getAs[Boolean]("paired"))
    assert(out.getAs[Double]("merged_warn_frac") === 0.0)
    assert(out.getAs[Double]("merged_error_frac") === 0.0)
    assert(!out.getAs[Boolean]("re_run"))
    // retained: 0.84 ok, 0.4 warn+error, 0.5 warn+error → warn 2/3 ≤ 0.7,
    // error 2/3 > 0.2 ⇒ discard
    assert(out.getAs[Boolean]("discard"))
  }

  test("zero denominators yield false flags, not errors") {
    val qc = SummaryQC.sampleQc(
      SummaryQC.readSummaryTsv(spark, s"$fixtures/summary_edge.tsv"))
    val rows = qc.collect().map(r => r.getAs[String]("srr") -> r).toMap
    val zeroLen = rows("SRR0000021")
    assert(zeroLen.isNullAt(zeroLen.fieldIndex("chimera_percent")))
    assert(!zeroLen.getAs[Boolean]("chimera_warn"))
    val zeroInput = rows("SRR0000022")
    assert(zeroInput.isNullAt(zeroInput.fieldIndex("retained_percent")))
    assert(!zeroInput.getAs[Boolean]("retained_warn"))
    assert(!zeroInput.getAs[Boolean]("merged_warn")) // forwd=0 guarded
  }
}
