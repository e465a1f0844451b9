package graft.operators

import graft.SparkTestBase

/** Registry-wide cache-hygiene gate: EVERY query must leave the session
  * CacheManager empty after a full materialization — i.e. no query may
  * `.persist()`/`.cache()` a frame it does not release before returning.
  * Intra-query materialization goes through eager localCheckpoint (RDD
  * blocks the ContextCleaner reclaims; never registered in the
  * CacheManager), so an embedding application needs no clearCache
  * contract between queries.
  *
  * This pins round 5's defect — d03/d06/d07/s06 cached shared frames and
  * relied on the runners to clear the session cache, which broke any
  * OTHER consumer in the same session (the d09 cache-empty asserts failed
  * in the full suite while passing in isolation) — as a permanently
  * guarded invariant over every current and future registry entry.
  */
class CacheHygieneSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name leaves the session cache empty") {
      // start clean so a leak from an earlier test can't mask this one
      spark.catalog.clearCache()
      fn(spark, sf).write.format("noop").mode("overwrite").save()
      assert(spark.sharedState.cacheManager.isEmpty,
        s"$name left persisted frames in the session cache")
    }
  }
}
