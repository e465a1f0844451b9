package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic invariants for the round-3 additions (q25-q28, s04): the
  * DuckDB oracle pins exact values; these pin the relationships — as-of
  * ordering, pivot mass conservation, set-op partitioning, percentile
  * membership, assignment optimality.
  */
class ExtendedQueriesSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String): DataFrame =
    graft.SparkEntry.queries(name)(spark, sf)

  test("q25 percentiles are elements of their group with correct rank bounds") {
    val byType = graft.core.Tables.events(spark, sf)
      .select("event_type", "value").collect()
      .groupBy(_.getString(0)).map { case (t, rs) =>
        t -> rs.map(_.getDouble(1)).sorted
      }
    run("q25_quantiles").collect().foreach { r =>
      val vals = byType(r.getString(0))
      val med = r.getAs[Double]("median_value")
      val p95 = r.getAs[Double]("p95_value")
      assert(vals.contains(med), "PERCENTILE_DISC must select an element")
      assert(vals.contains(p95))
      // discrete percentile: smallest element with cume_dist >= p
      val n = vals.length
      assert(vals.count(_ <= med) >= math.ceil(0.5 * n).toInt)
      assert(vals.count(_ < med) < math.ceil(0.5 * n).toInt)
      assert(med <= p95 && p95 <= r.getAs[Double]("max_value"))
    }
  }

  test("q26 set ops partition the customer keys") {
    val rows = run("q26_setops").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val custs = graft.core.Tables.load(spark, sf, "customer")
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val has = rows.filter(_._1 == "has_orders").map(_._2).toSet
    val not = rows.filter(_._1 == "no_orders").map(_._2).toSet
    assert(has.intersect(not).isEmpty)
    assert(has.union(not) === custs)
  }

  test("q27 pivot conserves event mass and matches q12-style long counts") {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val wide = run("q27_pivot").collect()
    val total = wide.map(r => types.map(t => r.getAs[Long](t)).sum).sum
    val expected = graft.core.Tables.events(spark, sf).count()
    assert(total === expected)
  }

  test("q28 as-of join: view_ts is the max view time at or before each purchase") {
    val views = graft.core.Tables.events(spark, sf)
      .filter(col("event_type") === "view")
      .select("user_id", "ts").collect()
      .groupBy(_.getLong(0))
      .map { case (u, rs) => u -> rs.map(_.getTimestamp(1).getTime).sorted }
    val purchases = graft.core.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    val out = run("q28_asof_join").collect()
    assert(out.nonEmpty && out.length <= purchases)
    out.foreach { r =>
      val u = r.getLong(1)
      val ts = r.getTimestamp(2).getTime
      val vts = r.getTimestamp(3).getTime
      val eligible = views.getOrElse(u, Array.empty[Long]).filter(_ <= ts)
      assert(eligible.nonEmpty && vts === eligible.max,
        s"user $u purchase@$ts expected ${eligible.lastOption}, got $vts")
    }
  }

  test("s04 assignment is the argmax-cosine centroid (driver-side recompute)") {
    // recompute centroids and assignments in plain Scala with the same
    // pinned fold order, then compare the full assignment
    val vecs = graft.core.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray, r.getInt(2).toLong))
      .sortBy(_._1)
    val centroids = vecs.groupBy(_._3).map { case (l, vs) =>
      val dim = vs.head._2.length
      val c = new Array[Double](dim)
      for (i <- 0 until dim) {
        var acc = 0.0
        vs.sortBy(_._1).foreach(v => acc += v._2(i)) // left fold by vec_id
        c(i) = acc / vs.length
      }
      l -> c
    }
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def nrm(a: Array[Double]) = math.sqrt(dot(a, a))
    val expected = vecs.map { case (id, v, own) =>
      val best = centroids.toSeq.map { case (l, c) =>
        (dot(v, c) / (nrm(v) * nrm(c)), l)
      }.maxBy { case (cos, l) => (cos, -l) } // cosine desc, label asc
      id -> best._2
    }.toMap
    val rows = run("s04_centroid_assign").collect()
    assert(rows.length === vecs.length)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getAs[Long]("assigned_label") === expected(id),
        s"vec $id assigned to non-optimal centroid")
      assert(r.getAs[Boolean]("is_own") ===
        (r.getAs[Long]("own_label") == expected(id)))
    }
  }

  test("q38 SCD2 intervals chain gaplessly with one current row per user") {
    val rows = run("q38_scd2_build").collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getString(2),
        r.getTimestamp(3), Option(r.getTimestamp(4)), r.getBoolean(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (u, g) =>
      val hist = g.sortBy(_._2)
      // versions contiguous from 1
      assert(hist.map(_._2).toSeq === (1 to hist.length), s"user $u")
      // each interval closes exactly where the next opens; only the last
      // is open-ended, and only it carries the current flag
      hist.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5.contains(b._4), s"user $u: gap/overlap at v${a._2}")
          assert(a._3 != b._3, s"user $u: consecutive versions same type")
        case _ =>
      }
      assert(hist.last._5.isEmpty && hist.last._6)
      assert(hist.init.forall(!_._6))
      assert(hist.count(_._6) === 1)
    }
    // change compression is faithful: replaying events per user yields the
    // same (type, change-timestamp) sequence
    val ev = graft.core.Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
    // replay in the query's full-precision order: getTime truncates to
    // milliseconds, so two same-millisecond events could replay in a
    // different order than q38's (ts, event_id) sort
    def micros(t: java.sql.Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    val expected = ev.groupBy(_._1).map { case (u, g) =>
      val ordered = g.sortBy(e => (micros(e._2), e._3))
      val changes = ordered.foldLeft(List.empty[(String, java.sql.Timestamp)]) {
        case (acc, e) =>
          if (acc.headOption.exists(_._1 == e._4)) acc
          else (e._4, e._2) :: acc
      }.reverse
      u -> changes
    }
    rows.groupBy(_._1).foreach { case (u, g) =>
      val got = g.sortBy(_._2).map(r => (r._3, r._4)).toList
      assert(got === expected(u), s"user $u: history differs from replay")
    }
  }

  test("q42 multi-touch: exact halving weights, shares sum to 1, covers q34's last-touch pairs") {
    val rows = run("q42_multi_touch").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getAs[Long]("hours_before"),
        r.getAs[Long]("weight"), r.getAs[Double]("share")))
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, h, w, sh) =>
      assert(h >= 0 && h <= 23)
      assert(w === (1L << (30 - h)).toLong, "weight must be the exact power of two")
      assert(sh > 0.0 && sh <= 1.0)
    }
    rows.groupBy(_._1).foreach { case (p, g) =>
      // every share is w_i/W with an exact integer W, so the float sum of
      // the group is 1 up to representation error only
      assert(math.abs(g.map(_._5).sum - 1.0) < 1e-12, s"purchase $p shares")
    }
    // q34's window is CLOSED at exactly one hour (>=) while the zero-hour
    // decay bucket is half-open ([0, 1h)); compare against q34's strict
    // interior so a click at exactly Δ = 1 h can't fail the spec
    def micros(t: java.sql.Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    val q34Strict = run("q34_event_attribution").collect()
      .filter(r => micros(r.getTimestamp(2)) - micros(r.getTimestamp(4))
        < 3600L * 1000000L)
      .map(r => (r.getLong(1), r.getLong(3))).toSet
    val h0 = rows.filter(_._3 === 0L).map(r => (r._1, r._2)).toSet
    assert(h0 === q34Strict,
      "the first decay bucket must equal the last-touch join's strict interior")
  }

  test("t31 BM25: contiguous descending top-10, self excluded, saturation bound holds") {
    val rows = run("t31_bm25_topk").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (q, _, doc, score, nTerms) =>
      assert(doc !== q, "a query doc must never retrieve itself")
      assert(score > 0L && nTerms >= 1L && nTerms <= 4L)
    }
    rows.groupBy(_._1).foreach { case (q, g) =>
      val byRank = g.sortBy(_._2)
      assert(byRank.map(_._2) === (1L to byRank.length).toArray.toSeq,
        s"query $q: ranks must be contiguous from 1")
      assert(byRank.length <= 10)
      assert(byRank.sliding(2).forall {
        case Array(a, b) => a._4 > b._4 || (a._4 == b._4 && a._3 < b._3)
        case _           => true
      }, s"query $q: scores must be non-increasing with doc_id tiebreak")
    }
    // Okapi saturation: per-term score_i < idf_i·(k1+1) = idf_i·44/20, and
    // idf_i ≤ ((N+1)·1000) div 3 (df ≥ 1) — so a doc matching m terms is
    // bounded by m · ((N+1)·1000 div 3) · 44 div 20, independent of tf/dl.
    val n = graft.core.Tables.load(spark, sf, "documents").count()
    rows.foreach { case (_, _, _, score, m) =>
      assert(score < m * (((n + 1) * 1000L) / 3L) * 44L / 20L,
        "BM25 saturation bound violated")
    }
  }

  test("s19 RRF: integer fusion identity, leg presence, both-legs dominance over single-leg") {
    // sf0.01: the sf0.001 corpus has no doc surfaced by BOTH legs, so the
    // dominance branch would be vacuous at the default fixture scale
    val rows = graft.SparkEntry
      .queries("s19_hybrid_rrf")(spark, "/root/testdata/sf0.01").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5))))
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, _, rrf, vr, lr) =>
      assert(vr.isDefined || lr.isDefined, "a fused doc must come from a leg")
      assert(vr.forall(r => r >= 1 && r <= 20) && lr.forall(r => r >= 1 && r <= 20))
      val expect = vr.map(r => 1000000000L / (60L + r)).getOrElse(0L) +
        lr.map(r => 1000000000L / (60L + r)).getOrElse(0L)
      assert(rrf === expect, "rrf must be the exact integer rank fusion")
    }
    rows.groupBy(_._1).foreach { case (q, g) =>
      val byRank = g.sortBy(_._2)
      assert(byRank.map(_._2) === (1L to byRank.length).toArray.toSeq)
      assert(byRank.length <= 10)
      assert(byRank.sliding(2).forall {
        case Array(a, b) => a._4 > b._4 || (a._4 == b._4 && a._3 < b._3)
        case _           => true
      }, s"query $q: fused order must follow (rrf desc, doc_id)")
    }
    // the defining RRF property: worst both-legs doc (20, 20) beats the best
    // single-leg doc (rank 1): 2·(1e9 div 80) = 25e6 > 1e9 div 61 ≈ 16.4e6
    val both = rows.filter(r => r._5.isDefined && r._6.isDefined)
    val single = rows.filter(r => r._5.isEmpty != r._6.isEmpty)
    assert(both.nonEmpty, "fixture must exercise the both-legs branch")
    assert(single.nonEmpty)
    assert(both.map(_._4).min > single.map(_._4).max,
      "every both-legs doc must dominate every single-leg doc")
  }

  test("s20 funnel: contiguous descending top-10 from within the top-50 screen; the rerank genuinely reorders") {
    val rows = run("s20_two_stage_rerank").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (q, _, vec, _, s1) =>
      assert(vec !== q, "a query must never retrieve itself")
      assert(s1 >= 1L && s1 <= 50L,
        "every reranked doc must come from the stage-1 candidate set")
    }
    var reordered = false
    rows.groupBy(_._1).foreach { case (q, g) =>
      val byRank = g.sortBy(_._2)
      assert(byRank.map(_._2) === (1L to byRank.length).toArray.toSeq,
        s"query $q: ranks must be contiguous from 1")
      assert(byRank.length <= 10)
      assert(byRank.sliding(2).forall {
        case Array(a, b) => a._4 > b._4 || (a._4 == b._4 && a._3 < b._3)
        case _           => true
      }, s"query $q: final order must follow (cosine desc, vec_id)")
      // stage-1 ranks are distinct within a query, so any inversion
      // against the final order is a genuine rerank correction
      if (byRank.map(_._5).sliding(2).exists {
        case Array(a, b) => a > b
        case _           => false
      }) reordered = true
    }
    assert(reordered,
      "the exact rerank must visibly reorder the prefix screen somewhere — otherwise the funnel is vacuous")
  }

  test("s21 curve is monotone in K and its K=50 point reconciles with s20's actual output") {
    val curve = run("s21_rerank_recall_curve").collect()
      .map(r => r.getInt(0) -> (r.getLong(3), r.getDouble(4))).toMap
    assert(curve.keySet === Set(10, 20, 50))
    assert(curve(10)._2 <= curve(20)._2 && curve(20)._2 <= curve(50)._2,
      "a larger stage-1 pool can only help recall")
    // exact full-dim truth, driver-side (the s04 recompute discipline)
    val vecs = graft.core.Tables.embeddings(spark, sf)
      .filter(col("embedding").isNotNull)
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      def dot(x: Array[Double], y: Array[Double]) =
        x.zip(y).map { case (p, q) => p * q }.sum
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    val queries = vecs.keys.filter(id => id % 50 == 0 && id < 2000)
    val exactTop10 = queries.map { q =>
      q -> vecs.keys.filter(_ != q).toSeq
        .map(v => (v, cos(vecs(q), vecs(v))))
        .sortBy { case (v, c) => (-c, v) }.take(10).map(_._1).toSet
    }.toMap
    // s20's final top-10 at pool 50 is exact-top-10 ∩ stage-1-top-50, so
    // the curve's hits@50 must equal the count of s20 rows that are true
    // exact-top-10 members — the operator meets its own tuning curve
    val s20Hits = run("s20_two_stage_rerank").collect()
      .count(r => exactTop10(r.getLong(0)).contains(r.getLong(2)))
    assert(curve(50)._1 === s20Hits.toLong,
      "hits@50 must equal s20's exact-top-10 member count")
  }

  test("d29 geometry curve: candidate sets nest as rows grow, truth is constant, and the 10x3 row IS d20") {
    val rows = run("d29_lsh_geometry_curve").collect()
      .map(r => (r.getInt(1), r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(_._1) // by rows_per_band ascending
    assert(rows.map(_._1).toSeq === Seq(1, 2, 3, 5))
    // one shared truth set prices every geometry
    assert(rows.map(_._2).distinct.length === 1,
      "n_true must be identical across geometries")
    rows.foreach { case (_, nTrue, nCand, nHit) =>
      assert(nHit <= math.min(nTrue, nCand)) }
    // an r-row aligned band window of length >= 3 always contains a fully
    // aligned smaller band (for these divisor geometries), so agreement
    // at larger r IMPLIES agreement at smaller r: candidates nest, and
    // with one truth set so do the hits
    assert(rows.map(_._3).sliding(2).forall {
      case Array(a, b) => a >= b
      case _           => true
    }, "candidate volume must be non-increasing in rows-per-band")
    assert(rows.map(_._4).sliding(2).forall {
      case Array(a, b) => a >= b
      case _           => true
    }, "hits must be non-increasing in rows-per-band (nested candidates)")
    // the curve meets the operator: the 10×3 point is exactly d20's audit
    val d20 = run("d20_lsh_recall_audit").collect().head
    val p103 = rows.find(_._1 == 3).get
    assert((p103._2, p103._3, p103._4) ===
      ((d20.getLong(0), d20.getLong(1), d20.getLong(2))),
      "the (10 bands × 3 rows) curve point must reproduce d20's numbers")
  }

  test("q47 HDR cells: driver recompute agrees, per-half histograms SUM to the whole (mergeability), bounds hold") {
    // independent Scala recompute of the histogram → quantile chain, plus
    // the sketch's defining property: cells built on disjoint halves merge
    // by pure addition into the full histogram
    def bucketLo(cents: Long): Long = {
      val e = 63 - java.lang.Long.numberOfLeadingZeros(cents)
      val lo = 1L << e
      if (lo >= 8) lo + ((cents - lo) / (lo / 8)) * (lo / 8) else cents
    }
    val evs = graft.core.Tables.events(spark, sf)
      .filter(col("value").isNotNull)
      .selectExpr("event_type", "cast(floor(value * 100 + 0.5) as bigint) as cents")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def cellsOf(rows: Array[(String, Long)]) =
      rows.groupBy { case (t, c) => (t, bucketLo(c)) }
        .map { case (k, g) => k -> g.length.toLong }
    val full = cellsOf(evs)
    val (h1, h2) = evs.partition(_._2 % 2 == 0)
    val merged = (cellsOf(h1).toSeq ++ cellsOf(h2).toSeq)
      .groupBy(_._1).map { case (k, g) => k -> g.map(_._2).sum }
    assert(merged === full,
      "per-half histograms must merge by addition into the full histogram")
    def estOf(t: String, num: Long, den: Long): Long = {
      val cells = full.collect { case ((tt, b), c) if tt == t => (b, c) }
        .toSeq.sortBy(_._1)
      val n = cells.map(_._2).sum
      val need = (num * n + den - 1) / den
      cells.scanLeft(0L)(_ + _._2).zip(cells).collectFirst {
        case (cumBefore, (b, c)) if cumBefore + c >= need => b
      }.get
    }
    run("q47_hdr_quantiles").collect().foreach { r =>
      val t = r.getString(0)
      assert(r.getLong(2) === estOf(t, 1, 2), s"$t p50 estimate")
      assert(r.getLong(5) === estOf(t, 19, 20), s"$t p95 estimate")
      assert(r.getLong(8) === estOf(t, 99, 100), s"$t p99 estimate")
      assert(r.getBoolean(4) && r.getBoolean(7) && r.getBoolean(10),
        s"$t: every exact quantile must land inside its estimated bucket")
    }
  }

  test("q46: matched rows conserved across layouts, no false prunes, z-order prunes where single-key can't") {
    val rows = run("q46_zorder_skipping").collect().map(r =>
      (r.getString(0), r.getLong(2), r.getLong(3), r.getBoolean(8),
        r.getBoolean(9), r.getLong(10), r.getLong(11)))
    val byLayout = rows.groupBy(_._1)
    assert(byLayout.keySet === Set("linear", "bykey", "zorder"))
    // the three layouts are pure re-shardings of the same corpus: total rows
    // and total box-query matches must be identical
    assert(byLayout.values.map(_.map(_._2).sum).toSet.size === 1,
      "row mass must be conserved across layouts")
    assert(byLayout.values.map(_.map(_._3).sum).toSet.size === 1,
      "box-query matches must be conserved across layouts")
    // footer min/max pruning is conservative: a file holding any match may
    // never be skipped (the audit's correctness leg)
    rows.foreach { case (lay, _, nMatch, scanned, _, _, _) =>
      assert(nMatch == 0 || scanned, s"$lay: false prune on a matching file")
    }
    def readBox(l: String) = byLayout(l).head._6
    def readDay(l: String) = byLayout(l).head._7
    // box query: clustered layouts prune, insertion order reads everything
    assert(readBox("linear") === byLayout("linear").length.toLong,
      "insertion-order layout must scan every file for the box query")
    assert(readBox("zorder") < readBox("linear") &&
      readBox("bykey") < readBox("linear"))
    // date-only query: the single-key custkey sort prunes NOTHING (every
    // file spans the full date range) while the interleave still halves+
    // the scan — z-order's defining trade
    assert(readDay("bykey") === byLayout("bykey").length.toLong,
      "single-key layout must be blind to the date-only predicate")
    assert(readDay("zorder") < readDay("bykey"))
  }

  test("t33: distilled classifier beats the majority baseline on held-out docs; score bookkeeping consistent") {
    val rows = run("t33_quality_classifier").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getBoolean(6), r.getBoolean(7),
        r.getBoolean(8)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, nTok, nKnown, score, snorm, thr, keep, label, agree) =>
      assert(nKnown <= nTok, s"doc $id: known tokens exceed tokens")
      assert(id % 5 != 4 || id >= 2000, s"doc $id: train doc leaked into scoring")
      if (nTok > 0) assert(snorm === score.toDouble / nTok, s"doc $id snorm")
      else assert(snorm === 0.0 && score === 0L)
      assert(keep === (snorm > thr) && agree === (keep == label), s"doc $id flags")
    }
    // one threshold for the whole run (the broadcast 1-row calibration)
    assert(rows.map(_._6).distinct.length === 1)
    // the distilled model must beat predicting the majority class
    val agreeFrac = rows.count(_._9).toDouble / rows.length
    val majority = {
      val p = rows.count(_._8).toDouble / rows.length
      math.max(p, 1 - p)
    }
    assert(agreeFrac > majority,
      f"agreement $agreeFrac%.3f must beat majority baseline $majority%.3f")
  }

  test("t35: stored-model scoring is bit-identical to the t33 retrain; the plan has no train path") {
    val stored = run("t35_classifier_store")
    assert(stored.collect().toSeq === run("t33_quality_classifier").collect().toSeq,
      "persisted model must reproduce the retrain exactly")
    val plan = stored.queryExecution.executedPlan.toString
    assert(plan.contains("graft_clfstore"),
      "scoring must read the persisted weight/threshold store")
    assert(!plan.contains("LessThan(doc_id,2000)"),
      "the train-window scan must not appear in the consumer's plan")
  }

  test("d30: store drift audit — null-pattern law, all three verdicts, drift attributable to the planted edits") {
    val rows = run("d30_store_consistency").collect().map(r =>
      (Option(r.getString(0)), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    val byStatus = rows.groupBy(_._2)
    assert(byStatus.keySet === Set("consistent", "orphaned", "missing"),
      "the planted drift must surface every verdict")
    rows.foreach { case (_, st, stored, cur) =>
      st match {
        case "consistent" => assert(stored.isDefined && cur.isDefined)
        case "orphaned" => assert(stored.isDefined && cur.isEmpty)
        case "missing" => assert(stored.isEmpty && cur.isDefined)
      }
    }
    // a missing hash can only be minted by an edit: its canonical doc
    // carries the planted doc_id % 11 == 7 marker
    byStatus("missing").foreach { case (_, _, _, cur) =>
      assert(cur.get % 11 === 7L, s"missing hash from unedited doc ${cur.get}")
    }
    // consistency dominates: drift is the exception, not the rule
    assert(byStatus("consistent").length > rows.length / 2)
  }

  test("q50: constraint audit — verdict law, non-vacuous failure mix, single-pass aggregate plan") {
    val df = run("q50_constraint_audit")
    val rows = df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.map(_._1).toSeq === Seq("accepted_status_OF",
      "complete_orderdate", "fk_custkey_in_customer", "pk_unique_orderkey",
      "range_price_cap_250k", "range_price_positive"))
    rows.foreach { case (c, checked, viol, passed) =>
      assert(passed === (viol == 0L), s"$c verdict law")
      assert(viol >= 0L && viol <= checked, s"$c violation bound")
    }
    assert(rows.map(_._2).distinct.length === 1, "one table, one n_checked")
    // the TPC-H-ish data satisfies integrity but fails the planted
    // business rules — the report must show BOTH verdicts
    def v(c: String) = rows.find(_._1 == c).get
    assert(v("pk_unique_orderkey")._4 && v("fk_custkey_in_customer")._4 &&
      v("complete_orderdate")._4 && v("range_price_positive")._4)
    assert(!v("accepted_status_OF")._4 && !v("range_price_cap_250k")._4,
      "the planted business rules must fail on this data")
    // five checks ride ONE aggregate pass: adding a constraint adds a
    // column, not a scan — orders appears exactly twice (agg + FK leg)
    val full = df.queryExecution.executedPlan.toString
    val cut = full.indexOf("== Initial Plan ==")
    val plan = if (cut >= 0) full.substring(0, cut) else full
    val scans = plan.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans <= 3, s"six checks must not mean six passes: $scans scans")
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      "the metric pass must map-side combine")
  }

  test("t37: JSONL ingest — quarantine captures raw corrupt lines; missing fields default; extras ignored") {
    val rows = run("t37_jsonl_ingest").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(rows.length === 24, "both planted corrupt lines must be dropped from the valid set")
    assert(rows.forall(_._5 === 2L), "quarantine total = the two planted corrupt lines")
    // missing optional lang defaults to the BCP-47 undetermined tag
    assert(rows.exists(_._3 == "und") && rows.exists(_._3 != "und"))
    // docs carrying the unknown extra_field parse fine (schema projection)
    assert(rows.map(_._1).toSet.size === 24)
    // the dead-letter payloads are the raw lines, verbatim
    val raw = spark.read
      .schema("doc_id LONG, text STRING, lang STRING, source STRING, _corrupt_record STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json("/root/repo/fixtures/docs.jsonl")
    val quarantined = raw
      .filter(org.apache.spark.sql.functions.col("_corrupt_record").isNotNull)
      .collect().map(_.getString(4)).toSet
    assert(quarantined === Set(
      """{"doc_id": 999, "text": "truncated""",
      "not json at all"), "quarantine must carry the original lines for replay")
  }

  test("q49: CDC merge exercises all six matched/op paths; liveness and payload law") {
    val rows = run("q49_cdc_merge").collect().map(r =>
      (r.getLong(0), r.getBoolean(1), r.getString(2), r.getLong(3),
        r.getBoolean(4), if (r.isNullAt(5)) None else Some(r.getLong(5)),
        if (r.isNullAt(6)) None else Some(r.getLong(6))))
    assert(rows.nonEmpty)
    rows.foreach { case (k, hadBase, op, nOps, alive, oldC, newC) =>
      assert(alive === (op != "D"), s"key $k liveness")
      assert(newC.isDefined === alive, s"key $k: payload defined iff alive")
      assert(hadBase === (k < 1000000000L), s"key $k: NOT-MATCHED leg id space")
      assert(hadBase === oldC.isDefined, s"key $k old payload")
      assert(nOps === 1L || nOps === 2L)
    }
    // every (matched, op) combination must appear — incl. insert-on-missing
    // and delete-of-absent, the WHEN NOT MATCHED symmetry
    val paths = rows.map(r => (r._2, r._3)).toSet
    assert(paths === Set(true, false).flatMap(b =>
      Set("I", "U", "D").map((b, _))), s"missing merge paths: $paths")
    // out-of-order multi-change keys resolve (seq 2 wins) and exist
    assert(rows.exists(_._4 === 2L))
  }

  test("t36: Luhn validation — planted verdict mix, length gate, candidate grain fixture-bound") {
    val rows = run("t36_pii_luhn").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getBoolean(4)))
    assert(rows.nonEmpty)
    // the digit-free driver corpus must contribute ZERO candidates —
    // every row comes from the planted fixture id space
    assert(rows.forall(_._1 >= 9000000000L),
      "corpus rows leaked into the candidate set")
    // the wrong-length plants (12 and 23 digits) must be gone
    assert(rows.forall(r => r._3 >= 13 && r._3 <= 19))
    // both verdicts present (valid plants accepted, checksum flips rejected)
    assert(rows.exists(_._5) && rows.exists(!_._5),
      "fixture plants both verdicts; the validator must produce both")
    // every planted length shows up validated
    assert(Set(13L, 15L, 16L, 19L).subsetOf(
      rows.filter(_._5).map(_._3).toSet))
    // the multi-candidate docs mix one valid and one flipped candidate
    val multi = rows.groupBy(_._1).filter(_._2.length > 1)
    assert(multi.nonEmpty && multi.values.forall(g =>
      g.exists(_._5) && g.exists(!_._5)),
      "multi-candidate docs must carry split verdicts")
    assert(rows.forall(_._4.length == 4), "last4 is the PCI display form")
  }

  test("t34: PageRank invariants — teleport floor, mass bound, planted hub and dangling node") {
    val rows = run("t34_domain_pagerank").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    val n = rows.length.toLong
    val teleport = (15L * 1000000000000L) / (100L * n)
    // every node keeps at least the teleport mass; total never exceeds unit
    rows.foreach { case (dom, _, _, rank, share) =>
      assert(rank >= teleport, s"$dom below teleport floor")
      assert(share === rank.toDouble / 1e12)
    }
    assert(rows.map(_._4).sum <= 1000000000000L,
      "floors and the dangling sink only ever LOSE mass")
    // the md5-skewed edge derivation plants idx 0 as the hub: the
    // alphabetically-first domain absorbs every node's modulo bias...
    val first = rows.minBy(_._1)
    assert(first._4 === rows.map(_._4).max, "planted hub must hold top rank")
    // ...and is the planted dangling node (self-links only, dropped)
    assert(first._3 === 0L, "idx-0 node must be dangling")
    // some node receives nothing and sits exactly on the teleport floor
    assert(rows.exists(_._4 === teleport),
      "the highest ordinal receives no links: rank == teleport exactly")
  }

  test("t38: frontier BFS min-hop distances equal an independent driver-side BFS") {
    val rows = run("t38_domain_reachability").collect().map { r =>
      (r.getString(0), r.getLong(1), r.getBoolean(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4))
    }
    assert(rows.nonEmpty)
    // reached <=> hops present; seeds are exactly the hops-0 rows; cap holds
    rows.foreach { case (dom, _, isSeed, hops, reached) =>
      assert(reached === hops.isDefined, s"$dom: reached flag drifts")
      assert(isSeed === hops.contains(0L), s"$dom: seed flag drifts")
      hops.foreach(h => assert(h >= 0L && h <= 4L))
    }
    assert(rows.exists(_._3), "seed set must be non-empty by construction")
    // independent BFS over the same graph, collected at host grain
    val (nodes, edges) = TextAnalysis.domainGraph(spark, sf)
    val idxOf = nodes.select("domain", "idx").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val adj = edges.select("src", "tgt").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    var dist = rows.filter(_._3).map(r => idxOf(r._1) -> 0L).toMap
    var frontier = dist.keySet
    for (h <- 1L to 4L) {
      val next = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- dist.keySet
      dist ++= next.map(_ -> h)
      frontier = next
    }
    rows.foreach { case (dom, _, _, hops, _) =>
      assert(hops === dist.get(idxOf(dom)),
        s"$dom: query hops ${hops} != driver BFS ${dist.get(idxOf(dom))}")
    }
    // the planted hub (idx 0, every node's modulo bias) is reachable
    // within one hop of any seeded in-neighbor — with >= 20% of nodes
    // seeded it is reached in practice on every fixture scale
    assert(dist.contains(0L), "idx-0 hub must be reached")
  }

  test("q51: incremental view maintenance equals a Spark-side full recompute") {
    import org.apache.spark.sql.functions._
    val inc = run("q51_ivm_delta").collect().map(r =>
      (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))))
    assert(inc.nonEmpty)
    // internal consistency: new = old + delta, both measures
    inc.foreach { case (ck, (oc, on, dc, dn, nc, nn)) =>
      assert(nc === oc + dc, s"ck $ck cents drift")
      assert(nn === on + dn, s"ck $ck count drift")
    }
    // the batch genuinely exercises all three directions
    assert(inc.exists(_._2._4 < 0) && inc.exists(_._2._4 > 0),
      "deletes and inserts must both land")
    // full recompute on the Spark side: apply the resolved batch to the
    // snapshot (q49's semantics read off q49's own gated output), then
    // re-aggregate — must equal the incremental view on affected keys
    val base = graft.core.Tables.load(spark, sf, "orders")
      .select(col("o_orderkey").as("k"), col("o_custkey").as("ck"),
        expr("cast(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ckOf = base.map(r => r._1 -> r._2).toMap
    val q49 = run("q49_cdc_merge").collect().map(r =>
      (r.getLong(0), r.getString(2),
        if (r.isNullAt(6)) None else Some(r.getLong(6))))
    val touched = q49.map(_._1).toSet
    def nckey(k: Long): Long =
      graft.functions.Portable.h60Scala(s"nc_$k") % 1000 + 1
    val applied =
      base.filterNot(r => touched(r._1)) ++
        q49.collect { case (k, op, Some(nc)) if op != "D" =>
          (k, ckOf.getOrElse(k, nckey(k)), nc)
        }
    val affected = inc.map(_._1).toSet
    val recomputed = applied.filter(r => affected(r._2))
      .groupBy(_._2).view.mapValues(rs =>
        (rs.map(_._3).sum, rs.length.toLong)).toMap
    inc.foreach { case (ck, (_, _, _, _, nc, nn)) =>
      val (rc, rn) = recomputed.getOrElse(ck, (0L, 0L))
      assert((nc, nn) === ((rc, rn)),
        s"ck $ck: incremental ($nc,$nn) != recompute ($rc,$rn)")
    }
  }

  test("q48: bounded-heap top-k is row-identical to the window row_number spelling") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val heap = run("q48_grouped_topk").collect().toSeq
    val w = Window.partitionBy("c_nationkey")
      .orderBy(desc("c_acctbal"), asc("c_custkey"))
    val window = graft.core.Tables.load(spark, sf, "customer")
      .select(col("c_nationkey"),
        row_number().over(w).cast("long").as("rank"),
        col("c_custkey"), col("c_acctbal"))
      .filter(col("rank") <= 3)
      .orderBy("c_nationkey", "rank")
      .collect().toSeq
    assert(heap === window,
      "heap aggregate and window row_number must agree rank-for-rank")
    // every group emits min(k, group size) ranks, consecutively from 1
    heap.groupBy(_.getInt(0)).values.foreach { g =>
      assert(g.map(_.getLong(1)).sorted === (1L to g.size.toLong))
    }
  }
}
