package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame

/** Physical-plan audits: the properties that decide whether a query
  * survives a 100× scale-up — filter/column pushdown into the parquet
  * scan, broadcast vs shuffle join choice, and shuffle counts — asserted
  * against the executed plan so a regression (a lost broadcast hint, a
  * filter that stopped pushing, an accidental extra exchange) fails CI
  * instead of surfacing as a 10× slowdown on the cluster.
  *
  * Plans are inspected AFTER collect(): with AQE the final physical plan
  * only exists once the query ran.
  */
class PlanShapeSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  /** The FINAL adaptive plan only — AQE's toString appends the initial
    * plan too, which would double-count operators.
    */
  private def executedPlan(name: String): String = {
    val df = graft.SparkEntry.queries(name)(spark, sf)
    df.collect()
    val full = df.queryExecution.executedPlan.toString
    val cut = full.indexOf("== Initial Plan ==")
    if (cut >= 0) full.substring(0, cut) else full
  }

  private def countOf(plan: String, token: String): Int =
    token.r.findAllMatchIn(plan).length

  test("q05: conjunctive filter and IN-list push down to the parquet scan") {
    val plan = executedPlan("q05_filter_in")
    assert(plan.contains("PushedFilters: ["), plan.take(2000))
    assert(plan.contains("In(o_orderstatus") || plan.contains("In(value=o_orderstatus"),
      "IN-list should reach the scan")
    assert(plan.contains("EqualTo(o_orderpriority"), "equality should reach the scan")
  }

  test("q05: scan reads only the projected columns (pruning)") {
    val plan = executedPlan("q05_filter_in")
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("o_orderkey") && readSchema.contains("o_totalprice"))
    assert(!readSchema.contains("o_comment") && !readSchema.contains("o_custkey"),
      s"scan reads columns the query never uses: $readSchema")
  }

  test("q10: dimension joins are broadcast, not shuffled") {
    val plan = executedPlan("q10_join_agg")
    assert(countOf(plan, "BroadcastHashJoin") == 2, "nation and region broadcast")
    assert(!plan.contains("SortMergeJoin"),
      "a dimension join fell back to sort-merge")
  }

  test("t01: token stats is a pure narrow projection — zero pre-sort shuffles") {
    val plan = executedPlan("t01_token_stats")
    // the only exchange allowed is the final ORDER BY's range partitioning
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.forall(_.contains("rangepartitioning")),
      s"narrow operator acquired a data shuffle: $exchanges")
  }

  test("d04: simhash sketch adds no shuffle beyond the final sort") {
    val plan = executedPlan("d04_simhash")
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.forall(_.contains("rangepartitioning")),
      s"sketch operator acquired a data shuffle: $exchanges")
  }

  test("q28: as-of join shuffles once by user, not per role") {
    val plan = executedPlan("q28_asof_join")
    val hashExchanges = plan.linesIterator
      .filter(l => l.contains("Exchange hashpartitioning")).toSeq
    assert(hashExchanges.size == 1,
      s"expected exactly one hash exchange (user_id), got: $hashExchanges")
    assert(hashExchanges.head.contains("user_id"))
  }

  test("q01: aggregation is partial (map-side combine) before the exchange") {
    val plan = executedPlan("q01_groupby_having")
    assert(plan.contains("partial_count") || plan.contains("HashAggregate"),
      "groupBy should plan partial aggregation")
    // partial agg must appear below the exchange: find first Exchange line
    val lines = plan.linesIterator.toSeq
    val exIdx = lines.indexWhere(_.contains("Exchange hashpartitioning"))
    val partialBelow = lines.drop(exIdx).exists(_.contains("partial_count"))
    assert(exIdx >= 0 && partialBelow, "no map-side partial aggregate found")
  }

  test("q31: HLL sketch aggregates partially map-side (mergeable-sketch path)") {
    val plan = executedPlan("q31_approx_distinct")
    assert(plan.contains("partial_approx_count_distinct"),
      s"HLL must partial-aggregate before the exchange:\n${plan.take(3000)}")
  }

  test("s01: brute-force kNN broadcasts the query side (corpus never moves)") {
    val plan = executedPlan("s01_knn_bruteforce")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      "query set should broadcast")
    assert(!plan.contains("CartesianProduct"),
      "corpus-side cartesian product would shuffle the corpus")
  }

  test("q33: bin-bucketed range join is a hash join, never a nested loop") {
    val plan = executedPlan("q33_range_join")
    // The naive interval formulation plans BroadcastNestedLoopJoin; the
    // binned one must be an equi-join on (event_type, bin) with the range
    // predicate as a residual.
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"range join degenerated to a non-equi physical join:\n${plan.take(2000)}")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin")
      || plan.contains("ShuffledHashJoin"), "expected an equi hash/merge join")
  }

  test("q32: cube aggregates partially before the exchange (one-pass strata)") {
    val plan = executedPlan("q32_cube")
    assert(plan.contains("Expand"), "cube should expand grouping sets")
    assert(countOf(plan, "HashAggregate") >= 2,
      "cube must partial-aggregate map-side after the Expand")
  }

  test("d11: sketch kernel runs once — the band self-join reuses one exchange") {
    val plan = executedPlan("d11_simhash_hamming")
    // the sketch kernel ran once, inside the eager checkpoint — the
    // executed pair plan is sketch-only (the d14 discipline)
    assert(countOf(plan, "MapPartitions") == 0,
      s"pair plan must be sketch-only, kernel runs inside the checkpoint:\n${plan.take(2000)}")
    // merge-hinted self-join: SMJ over ONE reused ENSURE_REQUIREMENTS
    // exchange at every scale — never a broadcast of a corpus-sized band
    // frame off a misestimated input
    assert(plan.contains("ReusedExchange"),
      "second self-join side should reuse the band exchange")
    assert(!plan.contains("BroadcastHashJoin"),
      "the corpus band self-join must never broadcast")
  }

  test("s07: ADC probe join is broadcast — PQ codes never reshuffle for the probe") {
    val plan = executedPlan("s07_knn_ivfpq")
    assert("BroadcastHashJoin \\[label".r.findFirstIn(plan).isDefined,
      s"label = probe_label join must broadcast the probe side:\n${plan.take(2000)}")
    assert(!plan.contains("CartesianProduct"))
  }

  test("d12: eval window set broadcasts left-semi onto the corpus stream") {
    val plan = executedPlan("d12_decontaminate")
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"eval hashes must broadcast; corpus must not shuffle to meet them:\n${plan.take(2000)}")
    assert(!plan.contains("SortMergeJoin"))
  }

  test("t10: vocabulary top-k is TakeOrdered over one kernel pass — no global sort") {
    val plan = executedPlan("t10_vocab_stats")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-100 must plan TakeOrdered, not a full vocabulary sort:\n${plan.take(2000)}")
    assert(countOf(plan, "MapPartitions") == 1)
  }

  test("t11: frequency join is shuffle-hash (vocab never broadcasts or sorts)") {
    val plan = executedPlan("t11_token_rarity")
    assert(plan.contains("ShuffledHashJoin"),
      s"token-frequency join must honor the shuffle_hash hint:\n${plan.take(2000)}")
    assert(!plan.contains("SortMergeJoin"))
  }

  test("hot relational queries stay inside whole-stage codegen") {
    for (name <- Seq("q01_groupby_having", "q05_filter_in", "q13_qc_rollup")) {
      val plan = executedPlan(name)
      // executedPlan.toString marks codegen stages with a "*(n)" prefix
      assert(plan.contains("*("), s"$name lost codegen:\n${plan.take(1500)}")
    }
  }

  test("s08: nprobe=2 probe table broadcasts — corpus plan identical to s03's") {
    val plan = executedPlan("s08_knn_ivf_multiprobe")
    assert("BroadcastHashJoin \\[label".r.findFirstIn(plan).isDefined,
      s"list-membership join must broadcast the 2-rows-per-query probe side:\n${plan.take(2000)}")
    assert(!plan.contains("SortMergeJoin"),
      "the corpus must never sort-merge against the probe table")
  }

  test("d13: one cluster exchange feeds both self-join sides (ReuseExchange)") {
    val plan = executedPlan("d13_semantic_dedup")
    assert(plan.contains("ReusedExchange"),
      s"the within-cluster self-join must reuse the single repartition-by-cluster exchange:\n${plan.take(2000)}")
    assert(!plan.contains("CartesianProduct"),
      "pair generation must stay an equi-join on cluster, never a cross product")
  }

  test("q38: change-detect, version and interval-close share one shuffle and one sort") {
    val plan = executedPlan("q38_scd2_build")
    // one hash exchange on user_id for the windows; the only other
    // exchange is the final presentation sort's range partitioning
    assert(countOf(plan, "Exchange hashpartitioning") == 1,
      s"lag/row_number/lead must share a single user_id shuffle:\n${plan.take(2000)}")
    // the filter between the two window blocks preserves distribution
    // and order, so the second window must not re-sort
    assert(countOf(plan, "\\bSort \\[user_id") <= 2,
      s"windows should share the (user_id, ts, event_id) sort:\n${plan.take(2000)}")
  }

  test("parquet aggregate pushdown: COUNT/MIN/MAX answered from footer statistics") {
    // Whole-table COUNT/MIN/MAX need not read ANY data pages: parquet
    // footers already carry per-row-group counts and column min/max, and
    // the DSv2 scan answers the aggregate from them (PushedAggregation)
    // — on a 100 TB lake that is metadata-only I/O instead of a full
    // scan. Needs the V2 parquet path; the conf flip is session-local
    // and restored.
    import org.apache.spark.sql.functions._
    val confs = Seq(
      "spark.sql.sources.useV1SourceList" -> "",
      "spark.sql.parquet.aggregatePushdown" -> "true")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    val pushed =
      try {
        val q = graft.core.Tables.load(spark, sf, "lineitem")
          .agg(count(lit(1)).as("n"), min(col("l_orderkey")).as("mn"),
            max(col("l_orderkey")).as("mx"))
        val row = q.collect().head
        val plan = q.queryExecution.executedPlan.toString
        assert(plan.contains(
          "PushedAggregation: [COUNT(*), MIN(l_orderkey), MAX(l_orderkey)]"),
          s"aggregate must be answered from footer stats:\n${plan.take(2000)}")
        (row.getLong(0), row.getLong(1), row.getLong(2))
      } finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    // recompute on the restored default (v1 full-scan) path: the
    // footer-stat answer must be the data's answer
    val full = graft.core.Tables.load(spark, sf, "lineitem")
      .agg(count(lit(1)), min(col("l_orderkey")), max(col("l_orderkey")))
      .collect().head
    assert(pushed === ((full.getLong(0), full.getLong(1), full.getLong(2))))
  }

  test("runtime bloom filter: a dim-side filter row-filters the fact before its shuffle") {
    // The shuffle-join sibling of dynamic partition pruning: when the
    // join key is NOT the partition key, InjectRuntimeFilter builds a
    // bloom filter from the filtered creation side and semi-filters the
    // fact's rows BEFORE the join shuffle (might_contain on the scan
    // side) — at 100 TB that is the difference between shuffling the
    // whole fact table and shuffling the matching fraction. Thresholds
    // are sized for petabyte plans, so the spec lowers them to make the
    // injection observable at fixture scale.
    import org.apache.spark.sql.functions._
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = graft.core.Tables.load(spark, sf, "lineitem")
      val ord = graft.core.Tables.load(spark, sf, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      val j = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "l_quantity", "o_totalprice")
      val n = j.collect().length
      val plan = {
        val full = j.queryExecution.executedPlan.toString
        val cut = full.indexOf("== Initial Plan ==")
        if (cut >= 0) full.substring(0, cut) else full
      }
      assert(plan.contains("might_contain"),
        s"fact side must be bloom-filtered before its shuffle:\n${plan.take(2000)}")
      assert(plan.contains("bloom_filter_agg"),
        "the filtered dim must build the bloom filter")
      // the filter is a pure pruning aid: result cardinality is unchanged
      val expected = graft.core.Tables.load(spark, sf, "lineitem")
        .join(graft.core.Tables.load(spark, sf, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
          .hint("broadcast"), col("l_orderkey") === col("o_orderkey"))
        .count()
      assert(n.toLong === expected)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("q52: star join — date filter pushed to the orders scan, dims broadcast, fact bloom-filtered end-to-end") {
    // the gated query (q52_star_revenue) anchors what the isolated
    // bloom/DPP specs assert piecewise: on the REGISTRY query itself,
    // the selective date window reaches the orders parquet scan, the
    // nation⋈region product broadcasts, and — with the petabyte-sized
    // production thresholds scaled to the fixture — InjectRuntimeFilter
    // row-filters the lineitem fact from the filtered orders side
    // BEFORE its join shuffle
    import org.apache.spark.sql.functions._
    val basePlan = executedPlan("q52_star_revenue")
    assert(basePlan.contains("PushedFilters: [") &&
      basePlan.contains("GreaterThanOrEqual(o_orderdate"),
      s"date window must reach the orders scan:\n${basePlan.take(2000)}")
    assert(countOf(basePlan, "BroadcastHashJoin") >= 2,
      "region⋈nation and the dim join onto customer must broadcast")
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val df = graft.SparkEntry.queries("q52_star_revenue")(spark, sf)
      df.collect()
      val full = df.queryExecution.executedPlan.toString
      val cut = full.indexOf("== Initial Plan ==")
      val plan = if (cut >= 0) full.substring(0, cut) else full
      assert(plan.contains("might_contain"),
        s"lineitem must be bloom-row-filtered before its shuffle:\n${plan.take(2000)}")
      assert(plan.contains("bloom_filter_agg"),
        "the date-filtered orders side must build the bloom filter")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("kNN top-k windows run under WindowGroupLimit (bounded partial top-k)") {
    // Catalyst pushes a rank() <= k filter into WindowGroupLimitExec: a
    // size-k heap per group BEFORE the window's full sort, partial on the
    // map side — the optimization a hand-rolled top-k operator would
    // re-implement. Pin it so a refactor that breaks the pushdown (e.g.
    // filtering on a column derived FROM the rank instead of the rank
    // itself) fails here instead of surfacing as an executor-memory
    // regression on wide groups at scale.
    for (name <- Seq("s01_knn_bruteforce", "s03_knn_ivf",
        "s08_knn_ivf_multiprobe", "m05_patch_knn", "m06_patch_knn_lsh")) {
      val plan = executedPlan(name)
      assert(plan.contains("WindowGroupLimit"),
        s"$name lost the rank-filter pushdown:\n${plan.take(2000)}")
    }
  }

  test("d14: verification never re-touches the shingle frame") {
    val plan = executedPlan("d14_minhash_estimate")
    // the operator's whole point: the shingle kernel ran ONCE, inside the
    // eager signature checkpoint, so the executed pair-verification plan
    // contains NO MapPartitions at all — candidates are verified from the
    // 30-long signatures alone (d03's shape would re-scan shingles here)
    assert(countOf(plan, "MapPartitions") == 0,
      s"verification plan must be signature-only:\n${plan.take(2000)}")
    assert(plan.contains("ReusedExchange"),
      s"the band self-join must reuse one exchange:\n${plan.take(2000)}")
  }

  test("t13: packing pre-sort exchange partitions on the hash-bucket shard, never lang") {
    val plan = executedPlan("t13_sequence_pack_sharded")
    val hashEx = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.nonEmpty && hashEx.forall(_.contains("shard")),
      s"the running-sum window must shuffle on the 256-way bucket:\n$hashEx")
    assert(!hashEx.exists(_.contains("lang")),
      s"packing parallelism must not key on the ~6-value lang column:\n$hashEx")
  }

  test("d15: dedup plan reads the signature store, never re-shingles the corpus") {
    val plan = executedPlan("d15_incremental_neardup")
    assert(plan.contains("graft_sigstore"),
      s"stored side must scan the persisted signature parquet:\n${plan.take(2000)}")
    // zero shingle kernels in the executed dedup plan: the new batch's
    // signatures are eagerly checkpointed, the warehouse side is parquet
    assert(countOf(plan, "MapPartitions") == 0,
      s"no text kernel may run in the incremental dedup plan:\n${plan.take(2000)}")
    // every broadcast must be NEW-batch-sized: the band probe, the
    // producer-overlap anti-join's batch id-list (once per consumer of
    // the guarded store), and the two batch-bound candidate attaches.
    // WHICH side broadcasts is the load-bearing property and is pinned
    // by the subtree walk below; the count just bounds plan growth.
    assert(countOf(plan, "BroadcastExchange") <= 6,
      s"only new-batch-sized sides may broadcast:\n${plan.take(3000)}")
    // the r8 shape: with batch-bound candidates BROADCAST onto the
    // streamed store, every JOIN in the plan is broadcast-built from a
    // batch-bound side and the store only ever STREAMS — so no shuffled
    // join may appear at all. (Asserting on exchange partition keys
    // would be vacuous: partition keys are pair/bucket columns in both
    // the good and the regressed plan. A revert to the merge-hinted
    // attaches — the exact regression this pins — reintroduces
    // SortMergeJoins that shuffle the whole 240 B/doc sidecar per
    // daily batch.)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"every d15 join must broadcast a batch-bound side; the store only streams:\n${plan.take(3000)}")
    // and pin WHICH side: no BroadcastExchange subtree may contain the
    // store scan (subtree = following lines with deeper indentation)
    val lines = plan.linesIterator.toVector
    // tree depth = length of the structural prefix (spaces, ':', '+-');
    // stops BEFORE the '*(n)' codegen marker, which would otherwise
    // inflate a sibling's depth past its parent's
    def indent(l: String): Int =
      l.takeWhile(c => c == ' ' || c == ':' || c == '+' || c == '-').length
    lines.zipWithIndex.filter(_._1.contains("BroadcastExchange")).foreach {
      case (bl, i) =>
        val bi = indent(bl)
        val subtree = lines.drop(i + 1).takeWhile(l =>
          l.trim.isEmpty || indent(l) > bi)
        assert(!subtree.exists(_.contains("graft_sigstore")),
          s"the warehouse signature store must never broadcast:\n$bl\n${subtree.take(12).mkString("\n")}")
    }
  }

  test("d25: containment screen reads the sized store; batch sides broadcast, the store only streams") {
    val plan = executedPlan("d25_incremental_containment")
    assert(plan.contains("graft_sigstore"),
      s"stored side must scan the persisted signature+size parquet:\n${plan.take(2000)}")
    assert(countOf(plan, "MapPartitions") == 0,
      s"no text kernel may run in the incremental screen plan:\n${plan.take(2000)}")
    // the d15 discipline verbatim: every join broadcast-builds from a
    // batch-bound side (band probe, anti-join id-list, two candidate
    // attaches); the store streams through all of them
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"every d25 join must broadcast a batch-bound side; the store only streams:\n${plan.take(3000)}")
    val lines = plan.linesIterator.toVector
    def indent(l: String): Int =
      l.takeWhile(c => c == ' ' || c == ':' || c == '+' || c == '-').length
    lines.zipWithIndex.filter(_._1.contains("BroadcastExchange")).foreach {
      case (bl, i) =>
        val bi = indent(bl)
        val subtree = lines.drop(i + 1).takeWhile(l =>
          l.trim.isEmpty || indent(l) > bi)
        assert(!subtree.exists(_.contains("graft_sigstore")),
          s"the warehouse signature store must never broadcast:\n$bl\n${subtree.take(12).mkString("\n")}")
    }
  }

  test("d16: batch hashes broadcast-semi onto the store scan — the store never shuffles") {
    // asserted on the FULL adaptive string (initial plan included): at
    // fixture scale no batch hash hits the store, and AQE's
    // empty-relation propagation rightly erases the store subtree from
    // the final plan — the scale property lives in the static shape
    val df = graft.SparkEntry.queries("d16_incremental_exact")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_hashstore"),
      s"warehouse side must scan the persisted hash sidecar:\n${plan.take(2000)}")
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"batch hashes must broadcast left-semi onto the store:\n${plan.take(2000)}")
    assert(!plan.contains("SortMergeJoin"),
      "the store must never sort or shuffle to meet the batch")
  }

  test("d33: batch canons broadcast-semi onto the frontier store scan — the store never shuffles") {
    val df = graft.SparkEntry.queries("d33_url_frontier")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_urlstore"),
      s"the frontier side must scan the persisted canonical-URL sidecar:\n${plan.take(2000)}")
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"batch canons must broadcast left-semi onto the store:\n${plan.take(2000)}")
    assert(!plan.contains("SortMergeJoin"),
      "the store must never sort or shuffle to meet the batch")
  }

  test("s09: assignment reads the centroid store; the new batch never shuffles") {
    val plan = executedPlan("s09_incremental_assign")
    assert(plan.contains("graft_centstore"),
      s"assignment must read the persisted k-row centroid table:\n${plan.take(2000)}")
    // the stored corpus's vectors appear in the plan ONLY as their
    // centroid summary: exactly one embeddings scan (the new batch)
    assert(countOf(plan, "embeddings.parquet") == 1,
      s"stored vectors must never enter the assignment plan:\n${plan.take(2000)}")
    // centroids broadcast onto the batch; the batch itself never
    // exchanges before the per-vector argmin window
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "the k-row centroid table must broadcast")
    assert(!plan.contains("SortMergeJoin"),
      "the new batch must not shuffle to meet the centroids")
  }

  test("s10: centroid maintenance folds stats from the store scan; stored vectors never re-read") {
    val plan = executedPlan("s10_centroid_update")
    assert(plan.contains("graft_centstore"),
      s"the fold must read the persisted stats sidecar:\n${plan.take(2000)}")
    // the stored corpus enters ONLY via its stats: exactly one
    // embeddings scan (the new batch) in the whole update plan
    assert(countOf(plan, "embeddings.parquet") == 1,
      s"stored vectors must never enter the maintenance plan:\n${plan.take(2000)}")
    assert(!plan.contains("SortMergeJoin"),
      "the k-by-64-row stats fold must never sort-merge")
  }

  test("d08/d10: span re-attach is a shuffle-hash join over a map-side partial count-distinct") {
    // the shuffle_hash hint is load-bearing at 100 TB: a sort-merge
    // re-attach would SORT every span row of the corpus to meet the
    // qualifying-hash build side, and losing the partial (map-side)
    // count-distinct would shuffle every raw (span, doc) row into the
    // groupBy. Pin both, for the plain and the frequency-capped variant.
    for (name <- Seq("d08_dup_spans", "d10_capped_spans")) {
      val plan = executedPlan(name)
      assert(plan.contains("ShuffledHashJoin"),
        s"$name: the span re-attach must be a shuffle-hash join:\n${plan.take(2000)}")
      assert(plan.contains("partial_count(distinct"),
        s"$name: doc-count per span must partial-aggregate map-side:\n${plan.take(2000)}")
    }
  }

  test("d17: one rewrite kernel; cut lists re-attach shuffle-hash, never sort-merge") {
    val plan = executedPlan("d17_span_cut")
    // the window kernel ran inside the eager checkpoint during query
    // construction; the executed plan's ONLY typed kernel is the
    // rewrite pass over (text, cut positions)
    assert(countOf(plan, "MapPartitions") == 1,
      s"exactly the rewrite kernel may run in the cut plan:\n${plan.take(2000)}")
    // both attach joins (qualifying spans onto windows, cut lists onto
    // the corpus) are shuffle-hash: a sort-merge would sort every span
    // row / every document to meet a build side that is bounded
    assert(plan.contains("ShuffledHashJoin") && !plan.contains("SortMergeJoin"),
      s"cut-list attaches must be shuffle-hash joins:\n${plan.take(2000)}")
    assert(plan.contains("partial_count(distinct"),
      s"span doc-counts must partial-aggregate map-side:\n${plan.take(2000)}")
  }

  test("m07: frame-overlap self-join reuses one exchange and broadcasts nothing corpus-sized") {
    val plan = executedPlan("m07_video_overlap")
    // the two self-join sides derive from one checkpointed tag frame:
    // their ENSURE_REQUIREMENTS exchanges canonicalize equal and the
    // shuffle computes once (the d07 discipline at frame granularity)
    assert(plan.contains("ReusedExchange"),
      s"the tag self-join must reuse one exchange:\n${plan.take(2000)}")
    // the only broadcast allowed is the one-row video-count scalar
    // (IdentityBroadcastMode under the cross join — its subtree
    // naturally derives from the tag frame); no HASH-RELATION build
    // (the broadcast-join kind that would OOM on a corpus-sized side)
    // may contain the per-video tag frame
    val lines = plan.linesIterator.toVector
    def indent(l: String): Int =
      l.takeWhile(c => c == ' ' || c == ':' || c == '+' || c == '-').length
    lines.zipWithIndex
      .filter(_._1.contains("HashedRelationBroadcastMode")).foreach {
        case (bl, i) =>
          val bi = indent(bl)
          val subtree = lines.drop(i + 1).takeWhile(l =>
            l.trim.isEmpty || indent(l) > bi)
          assert(!subtree.exists(_.contains("frame_tag")),
            s"the per-video tag frame must never build a broadcast hash relation:\n$bl")
      }
  }

  test("t12: diversity kernel runs once with no shuffle before the output sort") {
    val plan = executedPlan("t12_lexical_diversity")
    assert(countOf(plan, "MapPartitions") == 1,
      s"moments kernel must run exactly once:\n${plan.take(2000)}")
    assert(countOf(plan, "Exchange hashpartitioning") == 0,
      s"a per-document projection must not shuffle:\n${plan.take(2000)}")
  }

  test("m09: interleaved packing shuffles on the hash-bucket shard, never a natural column") {
    // t13's scale property carried to the multimodal writer: the running
    // token-budget window must key on the 256-way md5 bucket (a knob),
    // never a low-cardinality natural column whose skew would bound
    // parallelism
    val plan = executedPlan("m09_interleaved_pack")
    val hashEx = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.nonEmpty && hashEx.forall(_.contains("shard")),
      s"the packing window must shuffle on the hash bucket:\n$hashEx")
    assert(!hashEx.exists(l => l.contains("lang") || l.contains("source")),
      s"packing parallelism must not key on a natural skewed column:\n$hashEx")
  }

  test("t20: redaction is a pure narrow projection — zero data shuffles, two-column scan") {
    val plan = executedPlan("t20_redaction")
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.forall(_.contains("rangepartitioning")),
      s"a per-document scrub must not shuffle data:\n$exchanges")
    assert(countOf(plan, "MapPartitions") == 0,
      s"redaction must ride codegen'd built-ins, no typed kernel:\n${plan.take(2000)}")
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("text"),
      s"scan must read the text column: $readSchema")
    assert(!readSchema.contains("lang") && !readSchema.contains("source"),
      s"scan reads columns the scrub never uses: $readSchema")
  }

  test("q40: every retention exchange keys on high-cardinality columns; aggregates are partial") {
    // the 100 TB property: the raw event stream collapses to distinct
    // user-months map-side BEFORE any other exchange, and no shuffle keys
    // on a low-cardinality column — no reducer inherits the corpus
    val plan = executedPlan("q40_cohort_retention")
    val lines = plan.linesIterator.toSeq
    val exIdx = lines.indexWhere(_.contains("Exchange hashpartitioning"))
    assert(exIdx >= 0 && lines.drop(exIdx).exists(_.contains("HashAggregate")),
      s"the user-month distinct must partial-aggregate below its exchange:\n${plan.take(2000)}")
    val hashEx = lines.filter(_.contains("Exchange hashpartitioning"))
    assert(hashEx.forall(l => l.contains("user_id") || l.contains("cohort_month")),
      s"every exchange must key on user_id or the cohort pair:\n$hashEx")
    // cohort month attaches via a per-user window — no self-join to mis-plan
    assert(!plan.contains("Join"),
      s"the cohort attach must be a window, never a self-join:\n${plan.take(2000)}")
  }

  test("d20: the audit joins output-bound pair sets and rolls up map-side") {
    // the index-quality report must stay pair-set-sized: the truth/candidate
    // legs meet in an equi-join on the pair (never a cartesian), and the
    // one-row metrics rollup partial-aggregates before its single exchange
    val plan = executedPlan("d20_lsh_recall_audit")
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      s"the truth/candidate meet must be an equi-join on the pair:\n${plan.take(2000)}")
    assert(plan.contains("FullOuter"),
      s"missed AND spurious pairs must both survive the meet:\n${plan.take(2000)}")
    assert(plan.contains("partial_count"),
      s"the metrics rollup must partial-aggregate map-side:\n${plan.take(2000)}")
    // both legs derive from the one eagerly-checkpointed shingle frame:
    // no text kernel may run in the executed audit plan
    assert(countOf(plan, "MapPartitions") == 0,
      s"the audit plan must be checkpoint-fed, no re-shingling:\n${plan.take(2000)}")
  }

  test("t21: df attaches shuffle-hash (vocab never broadcast); top-5 runs under WindowGroupLimit") {
    // the two 100 TB properties: a corpus vocabulary is not
    // broadcastable (t11's rule — losing the hint re-plans a
    // multi-GB broadcast build at scale), and the per-doc top-5 must
    // group-limit BEFORE the rank shuffle (t15's rule — otherwise every
    // (doc, token, tf) row shuffles to the window)
    val plan = executedPlan("t21_tfidf_keywords")
    assert(plan.contains("ShuffledHashJoin"),
      s"the df table must join shuffle-hash:\n${plan.take(2000)}")
    assert(!plan.contains("BroadcastHashJoin") && !plan.contains("SortMergeJoin"),
      s"the vocab side must neither broadcast nor sort-merge:\n${plan.take(2000)}")
    assert(plan.contains("WindowGroupLimit"),
      s"kw_rank<=5 must compile to a partial per-partition top-k:\n${plan.take(2000)}")
    assert(plan.contains("partial_count"),
      s"tf/df rollups must partial-aggregate map-side:\n${plan.take(2000)}")
  }

  test("s12: one corpus kernel pass, query side broadcast, both rank windows share one exchange") {
    // the three 100 TB properties: the quantize kernel runs ONCE
    // (corpus side — a second pass on the query branch would re-scan
    // the corpus to extract the sample), the sampled query set is the
    // broadcast side (never the corpus), and both row_number windows
    // partition on query_id so they ride ONE hash exchange
    val plan = executedPlan("s12_int8_recall_audit")
    assert(countOf(plan, "MapPartitions") == 1,
      s"exactly the corpus-side quantize kernel may run:\n${plan.take(3000)}")
    assert(plan.contains("BroadcastNestedLoopJoin BuildRight"),
      s"the query sample must be the broadcast build side:\n${plan.take(3000)}")
    assert(countOf(plan, "Exchange hashpartitioning\\(query_id") == 1,
      s"the two rank windows must share one query_id exchange:\n${plan.take(3000)}")
    assert(countOf(plan, "Window ") == 2,
      s"both exact and quantized ranks must be windowed:\n${plan.take(3000)}")
  }

  test("d21: corpus collapses map-side to |sources|x30 cells; pair join broadcast over a reused exchange") {
    // the 100 TB properties: partial_min folds every partition to
    // |sources|×30 cells BEFORE the (tiny) shuffle — the corpus itself
    // never shuffles; the pair join's second signature branch reuses
    // the first's exchange instead of re-scanning the corpus; and the
    // |sources|² pair join is a broadcast, never a sort-merge
    val plan = executedPlan("d21_source_overlap")
    assert(plan.contains("partial_min"),
      s"per-source signature mins must partial-aggregate map-side:\n${plan.take(3000)}")
    assert(countOf(plan, "MapPartitions") == 1,
      s"the shingle kernel may run once:\n${plan.take(3000)}")
    assert(plan.contains("ReusedExchange"),
      s"the pair join's b-side must reuse the signature exchange:\n${plan.take(3000)}")
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"the |sources|^2 pair join must broadcast:\n${plan.take(3000)}")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"no corpus-sized join may appear:\n${plan.take(3000)}")
  }

  test("s13: audit runs on the k-row checkpointed stats — the corpus parquet never re-enters") {
    // the 100 TB property: the one corpus scan collapses to k
    // sufficient-statistics rows at checkpoint build; every consumer
    // (k² pair distances, argmin window, 1-row total, share join) reads
    // those k rows — a FileScan in the final plan would mean the audit
    // re-reads the corpus per consumer
    val plan = executedPlan("s13_ivf_balance")
    assert(!plan.contains("FileScan parquet"),
      s"all consumers must read the checkpointed k-row stats:\n${plan.take(3000)}")
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"the k^2 pair join must broadcast:\n${plan.take(3000)}")
    assert(!plan.contains("SortMergeJoin"),
      s"nothing here is corpus-sized, nothing may sort-merge:\n${plan.take(3000)}")
  }

  test("t22: pair counts collapse map-side; top-20 is TakeOrdered, never a full sort") {
    // the 100 TB properties: the pair key space is alphabet-bounded, so
    // partial_count collapses every partition to |alphabet|² cells
    // before the shuffle, and the top-20 forwards K rows per partition
    // (TakeOrderedAndProject) — a global Sort of the pair table would
    // mark the rank window leaking to corpus scale
    val plan = executedPlan("t22_bpe_pairs")
    assert(countOf(plan, "MapPartitions") == 1,
      s"exactly the pair kernel may run:\n${plan.take(3000)}")
    assert(plan.contains("partial_count"),
      s"pair counts must partial-aggregate map-side:\n${plan.take(3000)}")
    assert(plan.contains("TakeOrderedAndProject"),
      s"the top-20 must be a partition-capped TakeOrdered:\n${plan.take(3000)}")
  }

  test("s11: quantization is one kernel pass with zero data shuffles") {
    val plan = executedPlan("s11_int8_quantize")
    assert(countOf(plan, "MapPartitions") == 1,
      s"exactly the quantize kernel may run:\n${plan.take(2000)}")
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.forall(_.contains("rangepartitioning")),
      s"a per-vector projection must not shuffle data:\n$exchanges")
  }

  test("t15: the rank<=K cap runs under WindowGroupLimit, shuffling on source only") {
    // the 100 TB property: each input partition forwards at most K rows
    // per source to the shuffle — losing the group-limit pushdown turns a
    // hot domain into a single-partition full sort
    val plan = executedPlan("t15_source_cap")
    assert(plan.contains("WindowGroupLimit"),
      s"rank<=20 must compile to a partial per-partition top-k:\n${plan.take(2000)}")
    val hashEx = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.nonEmpty && hashEx.forall(_.contains("source")),
      s"the cap must shuffle on source, nothing else:\n$hashEx")
  }

  test("t16: resampling verdict rides the scan — rate table broadcasts, corpus never shuffles") {
    val plan = executedPlan("t16_dsir_resample")
    // the only allowed hash exchanges belong to the tiny lang rollup
    // (map-side partial first); the corpus side joins the broadcast rate
    // table and goes straight to the output sort
    assert(plan.contains("BroadcastHashJoin"),
      s"the k-row rate table must broadcast onto the corpus:\n${plan.take(2000)}")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"the corpus must never shuffle to learn its rate:\n${plan.take(2000)}")
    val hashEx = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.forall(_.contains("lang")),
      s"only the lang rollup may hash-exchange:\n$hashEx")
  }

  test("d18: probe joins the broadcast bloom bits; the store is touched only via the positives semi-join") {
    // asserted on the FULL adaptive string (d16 rationale): at fixture
    // scale the positive set may be empty and AQE's empty-relation
    // propagation erases the store subtree from the final plan
    val df = graft.SparkEntry.queries("d18_bloom_prefilter")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_bloomstore"),
      s"the probe must read the persisted bloom sidecar:\n${plan.take(2000)}")
    assert(plan.contains("graft_hashstore"),
      s"the exact verify must read the hash store:\n${plan.take(2000)}")
    assert(plan.contains("LeftSemi"),
      s"bloom-positive hashes must semi-join the store scan:\n${plan.take(2000)}")
    assert(!plan.contains("SortMergeJoin"),
      "neither the store nor the batch may sort-merge: bits and positives broadcast")
  }

  test("d19: cluster labels broadcast onto the corpus scan; the corpus never shuffles to learn its cluster") {
    val plan = executedPlan("d19_cluster_best")
    // CONSUME-ONLY (round 10): the labels enter as a SCAN of the
    // persisted component sidecar — the d09 CC loop must never run
    // inline here (its shingle kernel would surface as MapPartitions)
    assert(plan.contains("graft_labelstore"),
      s"d19 must read the persisted label store:\n${plan.take(2000)}")
    assert(countOf(plan, "MapPartitions") == 0,
      s"the CC build leaked back into the consumer plan:\n${plan.take(2000)}")
    // labels are the duplicated minority — they must be the BUILD side
    // of a broadcast join, and the documents scan must never appear
    // under a broadcast (the d15 walk: a corpus-sized broadcast OOMs
    // the cluster)
    assert(plan.contains("BroadcastHashJoin"),
      s"labels must broadcast onto the scored corpus:\n${plan.take(2000)}")
    assert(!plan.contains("SortMergeJoin"),
      s"the corpus must not shuffle to meet its labels:\n${plan.take(2000)}")
    val lines = plan.linesIterator.toVector
    def indent(l: String): Int =
      l.takeWhile(c => c == ' ' || c == ':' || c == '+' || c == '-').length
    lines.zipWithIndex.filter(_._1.contains("BroadcastExchange")).foreach {
      case (bl, i) =>
        val bi = indent(bl)
        val subtree = lines.drop(i + 1).takeWhile(l =>
          l.trim.isEmpty || indent(l) > bi)
        assert(!subtree.exists(_.contains("documents.parquet")),
          s"the corpus must never broadcast:\n$bl\n${subtree.take(12).mkString("\n")}")
    }
  }

  test("m08: image sketch checkpoints once; the band self-join reuses one exchange, no broadcast") {
    val plan = executedPlan("m08_image_neardup")
    // the patch kernel + 16-hyperplane signing ran once, inside the
    // eager checkpoint — the executed pair plan is sketch-only (d11)
    assert(countOf(plan, "MapPartitions") == 0,
      s"pair plan must be sketch-only:\n${plan.take(2000)}")
    assert(plan.contains("ReusedExchange"),
      "second self-join side should reuse the band exchange")
    assert(!plan.contains("BroadcastHashJoin"),
      "the corpus band self-join must never broadcast")
  }

  test("t17: chunking rides the scan — zero hash exchanges, no join, output-sort only") {
    // the 100 TB property: chunk geometry is pure per-row arithmetic, so
    // the operator must cost one scan + explode; any hash exchange here
    // means a planner regression turned a map-op into a shuffle
    val plan = executedPlan("t17_chunking")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"chunking must not shuffle:\n${plan.take(2000)}")
    assert(!plan.contains("Join"),
      s"chunking must not join:\n${plan.take(2000)}")
    assert(plan.contains("Generate explode"),
      s"chunk rows must come from an in-map explode:\n${plan.take(2000)}")
  }

  test("t19: the LM comes from the count sidecar — one documents scan, store folds map-side, LM broadcasts") {
    val plan = executedPlan("t19_incremental_familiarity")
    assert(plan.contains("graft_lmstore"),
      s"the LM must come from the persisted count sidecar:\n${plan.take(2000)}")
    // the batch side is the ONLY text read: re-reading the corpus to
    // build the LM is exactly what the sidecar exists to avoid. Two
    // documents scans are legitimate (the bigram kernel + the id spine
    // of the left join) — but only ONE may read the text column, and
    // the spine's must be pruned to doc_id
    val docScans = plan.linesIterator
      .filter(_.contains("documents.parquet")).toSeq
    assert(docScans.size == 2,
      s"expected the bigram-kernel scan + the doc_id spine scan:\n$docScans")
    assert(docScans.count(_.contains("text")) == 1,
      s"corpus text must be read once (the batch bigrams), never for the LM:\n$docScans")
    assert(plan.contains("TakeOrderedAndProject") &&
      plan.contains("BroadcastHashJoin") && !plan.contains("SortMergeJoin"),
      s"top-500 partial top-k + broadcast LM, no sort-merge:\n${plan.take(2000)}")
    // the sidecar fold must partial-aggregate below its exchange
    val lines = plan.linesIterator.toVector
    val exIdx = lines.indexWhere(_.contains("Exchange hashpartitioning"))
    assert(exIdx >= 0 && lines.drop(exIdx + 1)
        .exists(l => l.contains("HashAggregate") && l.contains("partial_sum")),
      s"the count fold must partial-sum below its exchange:\n${plan.take(2000)}")
  }

  test("d22: df-attach is shuffle-hash, candidate semi broadcasts, pair rollup is partial") {
    val plan = executedPlan("d22_containment")
    assert(plan.contains("ShuffledHashJoin"),
      s"the per-shingle df table must attach shuffle-hash (never sorted, never broadcast):\n${plan.take(2000)}")
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"the candidate doc set must broadcast-semi onto the exploded frame:\n${plan.take(2000)}")
    assert(plan.contains("partial_count(1)"),
      s"the intersection count must partial-aggregate map-side:\n${plan.take(2000)}")
    // prefix⋈full and the verification join are merge joins over shared
    // canonical exchanges — the d02 one-exchange discipline
    assert(plan.contains("SortMergeJoin") && plan.contains("ReusedExchange"),
      s"candidate/verify joins must reuse shingle exchanges:\n${plan.take(2000)}")
  }

  test("d05: block-bipartite all-pairs — only the block grid broadcasts, the corpus shuffle-hash colocates") {
    val plan = executedPlan("d05_embedding_neardup")
    // the ONLY broadcast builds are the 64-row block grid joins; the
    // embeddings table itself must reach the pair join through a shuffle
    // (the feasibility property: no corpus-sized broadcast build)
    assert(plan.contains("ShuffledHashJoin") || plan.contains("SortMergeJoin"),
      s"block pair join must colocate via shuffle, not broadcast:\n${plan.take(2000)}")
    val bhjCount = countOf(plan, "BroadcastHashJoin")
    assert(bhjCount == 2,
      s"exactly the two grid replications may broadcast (got $bhjCount):\n${plan.take(2000)}")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "all-pairs must be the equi-join on (ba, bb), never a nested loop")
  }

  test("m11: nothing broadcasts — the saturable screened pair set and the corpus both shuffle") {
    val plan = executedPlan("m11_image_dedup_verified")
    // a fixed 16-bit sketch saturates with corpus size (pairs ~n²/256),
    // so the screened set is NOT output-bound and must never be a
    // broadcast build (the sf1 decade check caught the old plan's
    // driver OOM); the corpus-vector sides are the shuffled-hash build
    assert(!plan.contains("BroadcastHashJoin") &&
        !plan.contains("BroadcastNestedLoopJoin"),
      s"no side of the verify attaches may broadcast:\n${plan.take(2000)}")
    assert(countOf(plan, "ShuffledHashJoin") >= 2,
      s"both vector attaches must be shuffled-hash with the corpus side as build:\n${plan.take(2000)}")
  }

  test("s16: both rank windows share ONE query_id exchange; the query set broadcasts") {
    val plan = executedPlan("s16_matryoshka_audit")
    val hashEx = plan.linesIterator
      .filter(l => l.contains("Exchange hashpartitioning") && l.contains("query_id"))
      .toSeq
    assert(hashEx.size == 1,
      s"full-dim and prefix-dim rankings must share one query exchange, got: $hashEx")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      "the sampled query set must broadcast; the corpus never moves")
  }

  test("q43: transitions are ONE user exchange; the grid rollup partial-aggregates") {
    val plan = executedPlan("q43_event_transitions")
    val userEx = plan.linesIterator
      .filter(l => l.contains("Exchange hashpartitioning") && l.contains("user_id"))
      .toSeq
    assert(userEx.size == 1,
      s"expected exactly one user_id exchange (the lead window), got: $userEx")
    assert(plan.contains("partial_count"),
      s"the (type, next_type) grid must partial-aggregate map-side:\n${plan.take(2000)}")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      "no join belongs in this plan")
  }

  test("q41: funnel is ONE user exchange with a map-side partial list build") {
    val plan = executedPlan("q41_funnel_pattern")
    assert(countOf(plan, "Exchange hashpartitioning") == 1,
      s"the per-user groupBy must be the only data shuffle:\n${plan.take(2000)}")
    assert(plan.contains("partial_collect_list"),
      s"the event-string build must partial-aggregate map-side:\n${plan.take(2000)}")
    assert(!plan.contains("Join"), s"no join belongs in this plan:\n${plan.take(2000)}")
  }

  test("t23: corpus collapses map-side to language rows; the budget total broadcasts") {
    val plan = executedPlan("t23_epoch_schedule")
    val lines = plan.linesIterator.toVector
    val exIdx = lines.indexWhere(l => l.contains("Exchange hashpartitioning") && l.contains("lang"))
    assert(exIdx >= 0 && lines.drop(exIdx + 1)
        .exists(l => l.contains("HashAggregate") && l.contains("partial_")),
      s"per-language stats must partial-aggregate below their exchange:\n${plan.take(2000)}")
    assert(plan.contains("BroadcastNestedLoopJoin") && plan.contains("IdentityBroadcastMode"),
      s"the 1-row weight total must broadcast, never shuffle the stats:\n${plan.take(2000)}")
  }

  test("s14: corpus never sort-merges — probes broadcast, truth reuses the query exchange") {
    val plan = executedPlan("s14_ivf_recall_curve")
    assert(!plan.contains("SortMergeJoin"),
      s"no corpus-side sort-merge belongs in the recall audit:\n${plan.take(2000)}")
    assert(plan.contains("BroadcastHashJoin"),
      s"the probe table must broadcast onto the corpus lists:\n${plan.take(2000)}")
    assert(plan.contains("ReusedExchange"),
      s"the truth/audit legs must share the query_id exchange:\n${plan.take(2000)}")
  }

  test("m10: both stacked windows share ONE doc exchange; no join") {
    val plan = executedPlan("m10_scene_segments")
    assert(countOf(plan, "Exchange hashpartitioning") == 1,
      s"lag + running-sum must share the (doc_id, frame_idx) exchange:\n${plan.take(2000)}")
    assert(!plan.contains("Join"), s"no join belongs in this plan:\n${plan.take(2000)}")
  }

  test("t24: ONE corpus scan — hash window + grid rollup; total is a grid-bounded window") {
    val plan = executedPlan("t24_dataset_card")
    // content-hash window + (source, lang) grid = the only corpus shuffles
    assert(countOf(plan, "Exchange hashpartitioning") == 2,
      s"card must cost two corpus exchanges (dup window, grid rollup):\n${plan.take(2000)}")
    assert(countOf(plan, "FileScan") == 1 && !plan.contains("Join"),
      s"a second corpus scan/join crept in:\n${plan.take(2000)}")
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      s"the grid rollup must partial-aggregate map-side:\n${plan.take(2000)}")
  }

  test("d23: band self-join reuses one exchange; size attaches are shuffle-hash; nothing broadcasts") {
    val plan = executedPlan("d23_containment_estimate")
    // the banded candidate generator's two sides must share ONE canonical
    // signature exchange (the d11/d13 discipline)
    assert(plan.contains("ReusedExchange"),
      s"the band self-join must reuse the signature exchange:\n${plan.take(2000)}")
    // signature attaches merge-SMJ; the two per-doc size attaches are
    // shuffle-hash — corpus-proportional sides, so NO broadcast join of
    // any kind belongs in this plan
    assert(plan.contains("SortMergeJoin") && countOf(plan, "ShuffledHashJoin") == 2,
      s"attach shapes drifted:\n${plan.take(2000)}")
    assert(!plan.contains("BroadcastHashJoin") && !plan.contains("BroadcastNestedLoopJoin"),
      s"a corpus-proportional side got broadcast:\n${plan.take(2000)}")
  }

  test("d24: one kernel pass feeds screen and verify; screened pairs broadcast; corpus never does") {
    val plan = executedPlan("d24_containment_screened")
    // every kernel (shingles, signatures) ran inside the eager
    // checkpoints during construction — the composed plan is
    // checkpoint-scan-only
    assert(countOf(plan, "MapPartitions") == 0,
      s"a kernel leaked into the composed containment plan:\n${plan.take(2000)}")
    // the screen leg (band join, size attaches) ran inside the screened
    // set's eager checkpoint — its shapes are pinned by the d23 test;
    // HERE the executed plan is the verify leg, whose inverted-index
    // self-join must reuse one canonical shingle exchange and stay a
    // merge join (spillable, skew-splittable — never a static broadcast
    // of the misestimated exploded frame)
    assert(plan.contains("ReusedExchange"),
      s"the verify self-join must reuse the shingle exchange:\n${plan.take(2000)}")
    assert(plan.contains("SortMergeJoin"),
      s"the verify join must stay a merge join:\n${plan.take(2000)}")
    // the output-bound screened pair set broadcasts into the verify leg
    // (doc restriction + pair-level semi)
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"screened candidates must broadcast into the verify joins:\n${plan.take(2000)}")
    // and nothing corpus-sized may sit under a broadcast
    val lines = plan.linesIterator.toVector
    def indent(l: String): Int =
      l.takeWhile(c => c == ' ' || c == ':' || c == '+' || c == '-').length
    lines.zipWithIndex.filter(_._1.contains("BroadcastExchange")).foreach {
      case (bl, i) =>
        val bi = indent(bl)
        val subtree = lines.drop(i + 1).takeWhile(l =>
          l.trim.isEmpty || indent(l) > bi)
        assert(!subtree.exists(l => l.contains("documents.parquet")),
          s"the corpus must never broadcast:\n$bl\n${subtree.take(12).mkString("\n")}")
    }
  }

  test("t25: the merge table is a broadcast top-k fold; the corpus never shuffles to segment") {
    val plan = executedPlan("t25_bpe_apply")
    // top-20 merge selection folds partially (K rows per partition),
    // never a full sort of the pair vocabulary
    assert(plan.contains("TakeOrderedAndProject"),
      s"the top-20 merge prune must be a partial top-k:\n${plan.take(2000)}")
    // the one-row rank-ordered merge array broadcasts into the
    // segmentation kernel's cross join; the corpus side stays in-map
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"the merge array must broadcast onto the corpus scan:\n${plan.take(2000)}")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"segmentation must not shuffle the corpus:\n${plan.take(2000)}")
  }

  test("t18: the pruned LM is a global top-k and broadcasts; the batch never shuffles on bigram") {
    val plan = executedPlan("t18_lm_familiarity")
    // fixed LM size ⇒ TakeOrderedAndProject (K rows per partition fold),
    // never a full global sort of the vocabulary
    assert(plan.contains("TakeOrderedAndProject"),
      s"the top-500 prune must be a partial top-k, not a full sort:\n${plan.take(2000)}")
    assert(plan.contains("BroadcastHashJoin"),
      s"the 500-row LM must broadcast onto the batch's bigram stream:\n${plan.take(2000)}")
    assert(!plan.contains("SortMergeJoin"),
      s"no side may sort-merge — the LM is bounded by construction:\n${plan.take(2000)}")
    // the reference slice's count aggregation is the one irreducible
    // corpus-scale exchange, and it must fold map-side first
    val lines = plan.linesIterator.toVector
    val exIdx = lines.indexWhere(_.contains("Exchange hashpartitioning"))
    assert(exIdx >= 0 && lines.drop(exIdx + 1)
        .exists(l => l.contains("HashAggregate") && l.contains("partial_count")),
      s"the LM count must partial-aggregate below its exchange:\n${plan.take(2000)}")
  }

  test("s15: both rank windows share ONE query_id exchange; the query set broadcasts") {
    val plan = executedPlan("s15_filtered_knn")
    // rank_all's query_id-only window runs below rank_lab's
    // (query_id, lm) window, and HashPartitioning(query_id) satisfies
    // both clusterings — reversed order would pay a second shuffle
    val hashEx = plan.linesIterator
      .filter(l => l.contains("Exchange hashpartitioning") && l.contains("query_id"))
      .toSeq
    assert(hashEx.size == 1,
      s"global and within-label rankings must share one query exchange, got: $hashEx")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      "the sampled query set must broadcast; the corpus never moves")
  }

  test("t26: one content-keyed exchange, map-side partial rollup, no join") {
    val plan = executedPlan("t26_hash_split")
    // the strategy unpivot happens before the shuffle, so the exact
    // leak count needs exactly one corpus-scale exchange (strategy,
    // content_hash); the 2x3 report rollup partial-aggregates
    val corpusEx = plan.linesIterator
      .filter(l => l.contains("Exchange hashpartitioning") && l.contains("content_hash"))
      .toSeq
    assert(corpusEx.size == 1,
      s"expected exactly one content-keyed exchange, got: $corpusEx")
    assert(!plan.contains("Join"), s"no join belongs in this plan:\n${plan.take(2000)}")
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      s"the report rollup must partial-aggregate map-side:\n${plan.take(2000)}")
  }

  test("m12: df-cap and pair joins stay shuffled on the landmark key — nothing corpus-scale broadcasts") {
    val plan = executedPlan("m12_audio_fingerprint")
    // the surviving-landmark set is corpus-scale at 100 TB: the cap
    // join must be shuffled-hash (d07's policy) and the pair self-join
    // sort-merge on the same key — a BroadcastHashJoin anywhere here
    // would ship an unbounded side
    assert(!plan.contains("BroadcastHashJoin") && !plan.contains("BroadcastNestedLoopJoin"),
      s"no unbounded side may broadcast:\n${plan.take(2000)}")
    assert(plan.contains("ShuffledHashJoin"),
      s"the df-cap join must be shuffled-hash:\n${plan.take(2000)}")
    assert(plan.contains("SortMergeJoin"),
      s"the pair self-join must sort-merge on the landmark key:\n${plan.take(2000)}")
  }

  test("m13: the whole five-window stack rides ONE doc-keyed exchange") {
    val plan = executedPlan("m13_keyframes")
    // lag/cut-sum cluster by doc_id, argmax/extent by (doc_id,
    // segment_id) — a doc_id subset — so no window may add a shuffle
    val hashEx = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.size == 1,
      s"expected exactly one hash exchange (doc_id), got: $hashEx")
    assert(!plan.contains("Join"), s"no join belongs in this plan:\n${plan.take(2000)}")
  }

  test("q44: one corpus-scale rollup exchange; the per-type moments broadcast back") {
    val plan = executedPlan("q44_volume_anomaly")
    assert(plan.contains("partial_count"),
      s"the (type, day) rollup must partial-aggregate map-side:\n${plan.take(2000)}")
    assert(plan.contains("BroadcastHashJoin"),
      s"the <=|types|-row moment frame must broadcast onto the daily grid:\n${plan.take(2000)}")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"nothing here may shuffle-join — both join sides are grid-sized:\n${plan.take(2000)}")
  }

  test("s17: the whole K-curve shares ONE query_id exchange, like s15") {
    val plan = executedPlan("s17_filter_recall_curve")
    val hashEx = plan.linesIterator
      .filter(l => l.contains("Exchange hashpartitioning") && l.contains("query_id"))
      .toSeq
    assert(hashEx.size == 1,
      s"all four K levels must price from one query exchange, got: $hashEx")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      "the query set and the 4-row level frame broadcast; the corpus never moves")
  }

  test("d26: label store enters as a SHUFFLED scan — neither corpus ids nor the store broadcast") {
    val plan = executedPlan("d26_cluster_histogram")
    assert(plan.contains("graft_labelstore"),
      s"the component labels must enter as a parquet scan:\n${plan.take(2000)}")
    // the store is corpus-minority but corpus-SCALE: the id attach must
    // be a shuffled join; the only permitted broadcast is the 1-row total
    assert(plan.contains("ShuffledHashJoin") || plan.contains("SortMergeJoin"),
      s"the label attach must shuffle, not broadcast:\n${plan.take(2000)}")
    val lines = plan.linesIterator.toVector
    def indent(l: String): Int =
      l.takeWhile(c => c == ' ' || c == ':' || c == '+' || c == '-').length
    lines.zipWithIndex.filter(_._1.contains("BroadcastExchange")).foreach {
      case (bl, i) =>
        val bi = indent(bl)
        val subtree = lines.drop(i + 1).takeWhile(l =>
          l.trim.isEmpty || indent(l) > bi)
        // a broadcast whose subtree reaches a corpus-scale scan is fine
        // ONLY below an aggregation (the 1-row total); a raw scan
        // broadcast would be the m11 failure class
        val reachesScan = subtree.exists(l =>
          l.contains("documents.parquet") || l.contains("graft_labelstore"))
        val collapsed = subtree.exists(_.contains("HashAggregate"))
        assert(!reachesScan || collapsed,
          s"only an aggregated total may broadcast:\n$bl")
    }
  }

  test("t27: store enters as a scan, batch partial-aggregates, the corpus never broadcasts") {
    val plan = executedPlan("t27_mixture_drift")
    assert(plan.contains("graft_cardstore"),
      s"the stored card must enter as a parquet scan:\n${plan.take(2000)}")
    assert(plan.contains("partial_count"),
      s"the batch grid count must partial-aggregate map-side:\n${plan.take(2000)}")
    // grid-sized sides may broadcast; the documents scan must not
    val lines = plan.linesIterator.toVector
    def indent(l: String): Int =
      l.takeWhile(c => c == ' ' || c == ':' || c == '+' || c == '-').length
    lines.zipWithIndex.filter(_._1.contains("BroadcastExchange")).foreach {
      case (bl, i) =>
        val bi = indent(bl)
        val subtree = lines.drop(i + 1).takeWhile(l =>
          l.trim.isEmpty || indent(l) > bi)
        assert(!subtree.exists(_.contains("documents.parquet")),
          s"the corpus must never broadcast:\n$bl")
    }
  }

  test("t28: the pruned profile broadcasts; trigram counting rides the scans (no corpus trigram shuffle)") {
    val plan = executedPlan("t28_ngram_langid")
    // the authored broadcast is the pivoted ≤|langs|·200-row profile,
    // probed on tg; AQE may add a size-based broadcast for the doc-id
    // attach at this tiny SF (both sides are doc-scale in production —
    // the invariant-sweep's auto-broadcast-off run polices that one)
    val bhj = plan.linesIterator.filter(_.contains("BroadcastHashJoin")).toVector
    assert(bhj.exists(_.contains("tg#")),
      s"the distance join must probe the broadcast profile on tg: $bhj")
    // per-doc counting and top-M selection happen inside the kernels —
    // no exchange may hash on the trigram + doc key (the corpus-scale
    // trigram frame must never exist); the train rollup's (lang, tg)
    // exchange is vocabulary-sized and allowed
    val exchanges = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toVector
    assert(!exchanges.exists(e => e.contains("doc_id") && e.contains("tg#")),
      s"corpus-scale (doc, trigram) shuffle: $exchanges")
  }

  test("d27: ONE key-carrying suffix sort; the maximality window ships only thin rows; no joins") {
    val plan = executedPlan("d27_max_dup_spans")
    // the corpus-keyed sort: exactly one Sort whose key list carries the
    // suffix array column (anchor, key) — the distributed suffix-array
    // order. The per-doc maximality window sorts too, but only AFTER the
    // projection to (doc_id, pos, dup_len), so its exchange ships 24-byte
    // rows, never the capped token arrays.
    val sorts = plan.linesIterator.filter(_.contains("Sort [")).toVector
    assert(sorts.count(_.contains("key#")) == 1,
      s"exactly one suffix-key sort expected:\n$sorts")
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toVector
    assert(exchanges.count(_.contains("hashpartitioning(anchor")) == 1 &&
      exchanges.count(_.contains("hashpartitioning(doc_id")) == 1 &&
      exchanges.count(_.contains("rangepartitioning")) == 1 &&
      exchanges.size == 3,
      s"anchor window + thin doc window + output sort only:\n$exchanges")
    assert(!plan.contains("Join") && !plan.contains("BroadcastExchange"),
      "pure window pipeline: no joins, nothing broadcasts")
    // the doc-keyed exchange must sit ABOVE the dup_len projection — its
    // input schema must not contain the token-array column
    val docEx = plan.linesIterator.indexWhere(_.contains("hashpartitioning(doc_id"))
    val below = plan.linesIterator.drop(docEx + 1).takeWhile(!_.contains("hashpartitioning(anchor")).toVector
    assert(below.exists(_.contains("Project [doc_id")),
      "the thin projection must precede the doc-keyed shuffle")
  }

  test("q45: one corpus exchange of partial KMV buffers, reused for both pair sides; sketch-grain pair join") {
    val plan = executedPlan("q45_kmv_distinct_algebra")
    // map-side combine: the partial graft_kmv aggregate sits BELOW the
    // one hash exchange, so the shuffle carries <= k-long buffers per
    // (partition, group) — never raw user ids
    assert(plan.contains("partial_graft_kmv"),
      "KMV must partial-aggregate map-side")
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toVector
    // a ReusedExchange line echoes the referenced exchange's text —
    // count only real Exchange operators
    assert(exchanges.count(l => l.contains("hashpartitioning(event_type") &&
      !l.contains("ReusedExchange")) == 1,
      s"exactly one sketch-build exchange:\n$exchanges")
    // the second pair side REUSES that exchange (one corpus pass total)
    assert(plan.contains("ReusedExchange"),
      "pair sides must share the single sketch-build exchange")
    // the pair grid joins aggregated sketch frames only — one broadcast,
    // built on the ObjectHashAggregate output, never a corpus frame
    assert(exchanges.count(_.contains("BroadcastExchange")) == 1 &&
      !plan.contains("SortMergeJoin"),
      "pair join = broadcast over the groups-row sketch frame")
  }

  test("d28: the anchor window pushes to the scan; only the fixed anchor set broadcasts") {
    val plan = executedPlan("d28_neardup_sample_audit")
    // the id window that freezes the anchor count reaches the parquet
    // scan — at scale the anchor side reads a vanishing file subset
    assert(plan.contains("LessThan(vec_id,2000)"),
      "anchor window must be a pushed filter")
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toVector
    assert(exchanges.count(_.contains("BroadcastExchange")) == 1,
      s"exactly the anchor set broadcasts:\n$exchanges")
    // corpus side: one scan, no shuffle anywhere before the output sort
    assert(exchanges.count(_.contains("hashpartitioning")) == 0,
      "the audit is shuffle-free except the output sort")
  }

  test("t30: probe selection is TakeOrderedAndProject; cells broadcast; both rollups partial-aggregate") {
    val plan = executedPlan("t30_cms_ngram_freq")
    assert(plan.contains("TakeOrderedAndProject(limit=100"),
      "probe selection must not materialize a full-vocab sort")
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toVector
    // gram-frequency exchange + (j, bucket) cell exchange — both fed by
    // partial_count (map-side combine), the cell frame then broadcasts
    assert(exchanges.count(_.contains("hashpartitioning(gram")) == 1 &&
      exchanges.count(_.contains("hashpartitioning(j")) == 1 &&
      exchanges.count(_.contains("BroadcastExchange")) == 1,
      s"one vocab exchange, one d*W cell exchange, cells broadcast:\n$exchanges")
    assert(plan.contains("partial_count"), "CMS cells merge map-side")
    assert(!plan.contains("SortMergeJoin"),
      "probe lookup joins the broadcast cells")
  }

  test("t31: inverted-index probe is a broadcast SEMI join; top-10 is WindowGroupLimit; dims broadcast") {
    // the registered query checkpoints the corpus explode and the probed
    // postings (each feeds 2–3 consumers), which hides the probe subtree
    // behind `Scan ExistingRDD` — so the probe shape is asserted on the
    // reuse=false twin, whose single executed plan shows everything
    val full = {
      val df = TextAnalysis.bm25Scored(spark, sf, reuse = false)
      df.collect()
      val s = df.queryExecution.executedPlan.toString
      val cut = s.indexOf("== Initial Plan ==")
      if (cut >= 0) s.substring(0, cut) else s
    }
    // the postings probe — only postings of query terms survive the scan,
    // so everything downstream is candidate-sized, never corpus-sized
    assert(full.contains("LeftSemi, BuildRight"),
      "postings probe must be a broadcast semi join on the workload-bounded term set")
    assert(!full.contains("SortMergeJoin"),
      "df / query-terms / totals attach as broadcast dims, never shuffled joins")
    val plan = executedPlan("t31_bm25_topk")
    assert(countOf(plan, "WindowGroupLimit.*row_number\\(\\), 10") >= 1,
      "per-query top-10 must compile to WindowGroupLimit (≤ 10 rows/query forwarded per partition)")
    assert(!plan.contains("SortMergeJoin"),
      "df / query-terms / totals attach as broadcast dims, never shuffled joins")
    assert(countOf(plan, "hashpartitioning\\(query_id[^)]*doc_id") == 1,
      "exactly one candidate-grain exchange — the per-(query, doc) score rollup")
    assert(countOf(plan, "Scan ExistingRDD") >= 2,
      "checkpointed corpus-explode and probed-postings frames enter as scans (reused, not replayed)")
  }

  test("t32: consumer reads ONLY the postings store — no corpus re-tokenization; probe is a visible broadcast semi") {
    val plan = executedPlan("t32_bm25_store_topk")
    assert(!plan.contains("documents.parquet"),
      "the stored-index scorer must never re-read the corpus text")
    assert(plan.contains("graft_bm25store"),
      "every scan must be the persisted postings store")
    // unlike t31 there are no checkpoints here, so the inverted-index
    // probe is directly visible in the final plan
    assert(plan.contains("LeftSemi, BuildRight"),
      "postings probe must be a broadcast semi join on the query-term set")
    assert(!plan.contains("SortMergeJoin"),
      "df / query-terms / totals attach as broadcast dims, never shuffled joins")
    assert(countOf(plan, "WindowGroupLimit.*row_number\\(\\), 10") >= 1,
      "per-query top-10 must compile to WindowGroupLimit")
  }

  test("s19: both legs are top-20-bounded BEFORE the fusion join; the only shuffled join is the full-outer fuse") {
    val plan = executedPlan("s19_hybrid_rrf")
    assert(countOf(plan, "WindowGroupLimit.*row_number\\(\\), 20") >= 2,
      "each leg must bound to top-20 per query before fusion")
    val smj = plan.linesIterator.filter(_.contains("SortMergeJoin")).toVector
    assert(smj.size == 1 && smj.head.contains("FullOuter"),
      s"exactly the fusion join is sort-merge and full-outer (legs are ≤ 20·|queries| rows):\n$smj")
    assert(countOf(plan, "WindowGroupLimit.*row_number\\(\\), 10") >= 1,
      "fused top-10 must compile to WindowGroupLimit")
  }

  test("s20: screen bounds to top-50 before the fetch; candidates broadcast into the fetch join; no shuffled join") {
    val plan = executedPlan("s20_two_stage_rerank")
    assert(countOf(plan, "WindowGroupLimit.*row_number\\(\\), 50") >= 1,
      "stage 1 must bound to top-50 per query (WindowGroupLimit) before any candidate work")
    assert(countOf(plan, "WindowGroupLimit.*row_number\\(\\), 10") >= 1,
      "stage 2 rerank must bound to top-10")
    // the 'fetch': full vectors re-attach to the OUTPUT-BOUND candidate
    // set by broadcast equi-join — the corpus side streams, zero shuffle
    assert(countOf(plan, "BroadcastHashJoin") >= 2,
      "candidate fetch and query attach must both be broadcast hash joins")
    assert(!plan.contains("SortMergeJoin"),
      "nothing in the funnel may shuffle a join: candidates and queries are workload-sized")
  }

  test("q47: octave assignment rides the scan (broadcast range join); histogram rollup partial-aggregates") {
    val plan = executedPlan("q47_hdr_quantiles")
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "the 40-row power-of-two table must attach as a broadcast range join, not a shuffle")
    assert(plan.contains("partial_count"),
      "the (type, cents) frequency rollup must partial-aggregate map-side")
    assert(!plan.contains("SortMergeJoin"),
      "exact-quantile audit leg and cells are both grid-sized — broadcast attaches only")
    // both legs (estimate + exact audit) hang off the SAME (type, cents)
    // frequency exchange: events is scanned once, the second consumer is
    // a ReusedExchange — the round-11 ask (VERDICT r11 item 7)
    assert(countOf(plan, "FileScan parquet") == 1,
      "estimate and exact-audit legs must share one events scan")
    assert(plan.contains("ReusedExchange"),
      "the shared frequency rollup must dedupe via ReuseExchange")
  }

  test("s23: query set broadcasts into one corpus pass; the band filter feeds a WindowGroupLimit top-5") {
    val plan = executedPlan("s23_hard_negatives")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"),
      "the pinned query set must broadcast — the corpus never moves")
    assert(!plan.contains("CartesianProduct"),
      "corpus-side cartesian product would shuffle the corpus")
    assert(countOf(plan, "WindowGroupLimit.*row_number\\(\\), 5") >= 1,
      "top-5 per query must compile to WindowGroupLimit (band-sized rank buffers)")
    assert(!plan.contains("SortMergeJoin"),
      "nothing in the mining pass may reshuffle the corpus")
  }

  test("t41: the checkpointed source grid feeds both consumers — no corpus scan in the final plan, totals attach broadcast") {
    val plan = executedPlan("t41_temperature_mix")
    // the corpus is tokenized ONCE, at the grid checkpoint's
    // materialization (outside this plan); the output and totals
    // branches must both read the 20-row RDD leaf, never re-scan —
    // without the rule-3 checkpoint, column pruning split the two
    // subtrees and the plan held TWO full documents scans
    assert(countOf(plan, "FileScan parquet") == 0,
      "a documents scan here means a consumer re-tokenized the corpus")
    assert(countOf(plan, "Scan ExistingRDD") >= 2,
      "both consumers must read the checkpointed grid")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"),
      "the 1-row totals frame must attach broadcast")
    assert(!plan.contains("SortMergeJoin"),
      "nothing at the |sources| grain may sort-merge")
  }

  test("t40: one full-outer reconciliation at posting grain; fresh rollup partial-aggregates; two scans only") {
    val plan = executedPlan("t40_postings_consistency")
    assert(plan.contains("FullOuter"),
      s"orphaned AND missing postings must both survive the meet:\n${plan.take(2000)}")
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      "the reconciliation must be an equi-join on (doc_id, token)")
    assert(plan.contains("partial_count"),
      "the fresh postings rollup must partial-aggregate map-side")
    assert(countOf(plan, "FileScan parquet") == 2,
      "exactly two scans: the persisted postings store and one corpus pass")
  }

  test("s21: prefix and exact ranks ride ONE corpus pass sharing one query_id exchange") {
    val plan = executedPlan("s21_rerank_recall_curve")
    // two BNLJs by design: the corpus×queries pass and the 3-row level
    // attach (which runs on the ≤ 10·|queries| truth rows, not the corpus)
    assert(countOf(plan, "BroadcastNestedLoopJoin") == 2,
      "one corpus×queries pass + the tiny level attach — nothing else")
    assert(countOf(plan, "Exchange hashpartitioning\\(query_id") == 1,
      "both rank windows must share a single query_id exchange")
    assert(!plan.contains("SortMergeJoin"))
  }

  test("q46: layout assignment is a pure projection — the corpus is never reshuffled; one stack pass") {
    val plan = executedPlan("q46_zorder_skipping")
    assert(countOf(plan, "FileScan parquet") == 2,
      "two scans only: the stats rollup and the assignment pass")
    // every hash exchange runs at (layout[, file_id]) grain — 96 groups;
    // the row-grain frame never shuffles (bucketing/z/file ids ride the scan)
    val ex = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toVector
    assert(ex.forall(_.contains("hashpartitioning(layout")),
      s"corpus-grain shuffle found:\n$ex")
    assert(plan.contains("partial_min(ck") && plan.contains("partial_count"),
      "stats and the per-file rollup must partial-aggregate map-side")
    assert(plan.contains("Generate stack"),
      "the three layouts fan out in ONE Generate over the same scan pass")
  }

  test("t33: train side rides the pushed id-window; model and threshold broadcast; no corpus sort-merge") {
    val plan = executedPlan("t33_quality_classifier")
    // the sample-bounded train slice reaches the scan as a pushed filter —
    // at scale the model build reads a vanishing file subset
    assert(plan.contains("LessThan(doc_id,2000)"),
      "train id-window must be a pushed filter")
    // corpus-side joins are all broadcast (256-row model, 1-row threshold,
    // per-doc score attach) — a corpus-grain sort-merge join would mean the
    // token stream shuffled on token
    assert(!plan.contains("SortMergeJoin"),
      "scoring must join the broadcast model, never shuffle the token stream")
    // the per-doc rollup partial-aggregates below its exchange
    assert(plan.contains("partial_count") && plan.contains("partial_sum"),
      "doc score rollup must map-side combine")
    // the scan reads only (doc_id, text)
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("doc_id") && readSchema.contains("text") &&
      !readSchema.contains("source") && !readSchema.contains("n_chars"),
      s"scan must read only (doc_id, text): $readSchema")
  }

  test("q48: heap top-k partial-aggregates map-side; no window, no per-group corpus sort") {
    val plan = executedPlan("q48_grouped_topk")
    // map-side combine: the exchange carries <= k-entry heap buffers per
    // (map task, nation), never raw customer rows
    assert(plan.contains("partial_graft_topk"),
      "graft_topk must partial-aggregate below the exchange")
    assert(!plan.contains("Window") && !plan.contains("row_number"),
      "the heap form must not fall back to a window")
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toVector
    assert(exchanges.count(l => l.contains("hashpartitioning(c_nationkey") &&
      !l.contains("ReusedExchange")) == 1 &&
      exchanges.count(_.contains("rangepartitioning")) == 1 &&
      exchanges.size == 2,
      s"one group exchange + the output sort only:\n$exchanges")
    // scan pruning: only the three referenced columns are read
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("c_nationkey") && readSchema.contains("c_acctbal") &&
      !readSchema.contains("c_name"),
      s"scan must read only the top-k columns: $readSchema")
  }

  test("t44: the tombstone erasure is a broadcast ANTI join on the store scan; corpus text never read") {
    val plan = executedPlan("t44_forget_postings")
    // the forget list broadcasts; the store — TBs at corpus scale —
    // streams through the anti join unshuffled
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      "tombstones must broadcast into an anti join")
    assert(!plan.contains("SortMergeJoin"),
      "the store must never co-shuffle with the tombstone list")
    assert(!plan.contains("documents.parquet"),
      "erasure must run from the postings store alone — no corpus re-read")
  }

  test("s29: the decrement folds the tombstone batch broadcast onto one store scan") {
    val plan = executedPlan("s29_forget_centroids")
    // the per-cluster decrement sums broadcast into the store-side left
    // join (the store is k×dim rows; the FOLD side is what must stay
    // small and broadcastable at any corpus size)
    assert(plan.contains("BroadcastHashJoin"),
      "tombstone sums must broadcast into the store join")
    assert(!plan.contains("SortMergeJoin"),
      "the decrement must not co-shuffle store and batch")
    // the batch's decimal sums partial-aggregate map-side before moving
    assert(plan.contains("partial_sum"),
      "tombstone statistics must map-side combine")
  }
}
