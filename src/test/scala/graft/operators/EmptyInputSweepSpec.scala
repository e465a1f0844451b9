package graft.operators

import graft.SparkTestBase

/** Degenerate-input sweep: every registry query must run to completion
  * on an EMPTY corpus (all nine tables present with their real schemas,
  * zero rows) and return a well-formed — usually empty — result, never
  * throw. At 100 TB this is not an edge case: a day's partition can be
  * empty, a filter can eliminate every row before an operator's core
  * stage, a fresh deployment starts with empty warehouse tables. An
  * operator that calls `.head` on a result, seeds a codebook from a
  * collected sample, or folds a convergence loop over no edges will
  * crash exactly there — this sweep makes that class of failure CI.
  *
  * The compendium fixture queries (c01–c10) read their checked-in
  * fixture files rather than the sf tables, so for them this asserts
  * plain executability; the relational/dedup/ANN/text/multimodal
  * surface is what genuinely exercises the zero-row paths (empty
  * shingle frames, empty signature stores, zero-edge CC loops, empty
  * centroid sets).
  */
class EmptyInputSweepSpec extends SparkTestBase {

  test("every registry query completes on an empty corpus (no degenerate-input crashes)") {
    val src = "/root/testdata/sf0.001"
    val dir = tmpDir()
    graft.core.Tables.all.foreach { t =>
      // events goes through the normalizing loader so the empty mirror
      // carries the normalized TIMESTAMP schema whatever the physical
      // encoding of the source generation
      val df =
        if (t == "events") graft.core.Tables.events(spark, src)
        else graft.core.Tables.load(spark, src, t)
      df.limit(0).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val failures = graft.SparkEntry.registry.flatMap { q =>
      try { q.run(spark, dir).collect(); Nil }
      catch {
        case e: Throwable =>
          Seq(s"${q.name}: ${e.getClass.getSimpleName}: " +
            String.valueOf(e.getMessage).takeWhile(_ != '\n').take(160))
      }
    }
    assert(failures.isEmpty,
      s"queries crashing on an empty corpus:\n  ${failures.mkString("\n  ")}")
  }

  test("every registry query completes on a single-row corpus") {
    // one row per table: the n=1 paths — sample stddev of one value,
    // self-joins with no qualifying pair, windows with a single frame,
    // centroid sets of one — are a distinct crash class from n=0
    // (different branches survive the emptiness checks)
    val src = "/root/testdata/sf0.001"
    val dir = tmpDir()
    graft.core.Tables.all.foreach { t =>
      val df =
        if (t == "events") graft.core.Tables.events(spark, src)
        else graft.core.Tables.load(spark, src, t)
      df.limit(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val failures = graft.SparkEntry.registry.flatMap { q =>
      try { q.run(spark, dir).collect(); Nil }
      catch {
        case e: Throwable =>
          Seq(s"${q.name}: ${e.getClass.getSimpleName}: " +
            String.valueOf(e.getMessage).takeWhile(_ != '\n').take(160))
      }
    }
    assert(failures.isEmpty,
      s"queries crashing on a single-row corpus:\n  ${failures.mkString("\n  ")}")
  }

  test("every registry query completes on a null-text-bearing corpus") {
    // real crawls deliver null text (fetch failures, encoding bombs);
    // NullTextSpec pins the kernel-level contracts, this sweep makes
    // the whole registry's tolerance CI — a null NPE inside one
    // mapPartitions kills the task, i.e. the daily batch
    import org.apache.spark.sql.functions.{col, lit}
    val src = "/root/testdata/sf0.001"
    val dir = tmpDir()
    graft.core.Tables.all.foreach { t =>
      val df =
        if (t == "events") graft.core.Tables.events(spark, src)
        else graft.core.Tables.load(spark, src, t)
      val out =
        if (t == "documents") {
          val maxId = df.agg(org.apache.spark.sql.functions.max(col("doc_id")))
            .head.getLong(0)
          val nulls = df.limit(3)
            .select((col("doc_id") + lit(maxId + 1)).as("doc_id"),
              lit(null).cast("string").as("text"),
              col("lang"), col("source"), lit(0L).as("n_chars"))
          df.unionByName(nulls)
        } else df
      out.write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val failures = graft.SparkEntry.registry.flatMap { q =>
      try { q.run(spark, dir).collect(); Nil }
      catch {
        case e: Throwable =>
          Seq(s"${q.name}: ${e.getClass.getSimpleName}: " +
            String.valueOf(e.getMessage).takeWhile(_ != '\n').take(160))
      }
    }
    assert(failures.isEmpty,
      s"queries crashing on a null-text corpus:\n  ${failures.mkString("\n  ")}")
  }
}
