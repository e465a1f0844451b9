package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame

/** Semantic invariants for the training-data pipeline operators, run
  * against the smallest driver-provided tables. Exact values are pinned by
  * the DuckDB oracle (tools/check_oracle.py); these tests pin the
  * *relationships* the oracle can't see: LSH recall vs the exact
  * algorithm, sketch determinism, rank contiguity, decode arithmetic.
  */
class PipelineOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String): DataFrame =
    graft.SparkEntry.queries(name)(spark, sf)

  test("d03 MinHash+LSH finds exactly the exact-Jaccard pair set (full recall)") {
    val exact = run("d02_ngram_jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = run("d03_minhash_lsh").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "test data should contain planted near-dups")
    assert(lsh === exact)
  }

  test("d06 prefix-filtered join equals the unfiltered exact join (lossless)") {
    // d06 runs at t=0.9 (its selective regime); d02's full join at 0.5 is
    // a superset — restrict it to the same threshold for the equality
    val exact = run("d02_ngram_jaccard").collect()
      .filter(_.getAs[Double]("jaccard") >= 0.9)
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet
    val pref = run("d06_prefix_jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet
    assert(pref.nonEmpty, "planted near-dups are at J >= 0.9")
    assert(pref === exact)
  }

  test("d07 frequency cap loses no true pair on this corpus (recall preserved)") {
    // the planted near-dups share RARE shingles; the >1%-df cap must only
    // shave boilerplate, so the capped pair set still covers d02's
    val exact = run("d02_ngram_jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = run("d07_capped_jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert(exact.subsetOf(capped) || capped === exact,
      s"cap dropped true pairs: ${(exact -- capped).take(5)}")
  }

  test("d08 duplicated spans sit inside near-dup documents and agree pairwise") {
    val spans = run("d08_dup_spans").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(spans.nonEmpty, "planted near-dups must share 12-token spans")
    // every qualifying hash appears in >= n_docs distinct docs, and each
    // (hash) group's rows carry the same n_docs
    spans.groupBy(_._3).foreach { case (_, g) =>
      val nd = g.head._4
      assert(g.map(_._4).distinct.length === 1)
      assert(g.map(_._1).distinct.length.toLong >= nd)
      assert(nd >= 2)
    }
    // near-dup doc pairs (J >= 0.9) must share at least one span
    val pairs = run("d02_ngram_jaccard").collect()
      .filter(_.getAs[Double]("jaccard") >= 0.9)
      .map(r => (r.getLong(0), r.getLong(1)))
    val docsByHash = spans.groupBy(_._3).map { case (h, g) =>
      h -> g.map(_._1).toSet }
    pairs.foreach { case (a, b) =>
      assert(docsByHash.values.exists(s => s.contains(a) && s.contains(b)),
        s"near-dup pair ($a, $b) shares no duplicated span")
    }
  }

  test("d27 finds planted maximal spans exactly: cross-doc, self-repeat, sub-span suppression") {
    import spark.implicits._
    def toks(prefix: String, n: Int): Seq[String] =
      (1 to n).map(i => s"$prefix$i")
    val s30 = toks("s", 30) // shared 30-token span
    val t15 = toks("t", 15) // self-repeated 15-token span
    val doc1 = (toks("u", 10) ++ s30 ++ toks("v", 10)).mkString(" ")
    val doc2 = (toks("w", 5) ++ s30 ++ toks("x", 20)).mkString(" ")
    val doc3 = (toks("y", 3) ++ t15 ++ toks("z", 5) ++ t15 ++ toks("q", 5))
      .mkString(" ")
    val frame = Seq((1L, doc1), (2L, doc2), (3L, doc3)).toDF("doc_id", "text")
    val got = Dedup.maximalDupSpans(frame).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // exactly the four maximal spans: the shared 30-gram at each host
    // position, and both copies of the within-doc 15-gram repeat; every
    // interior position (LCP 29, 28, ... / 14, 13, 12) is contained in
    // its predecessor's span and must be suppressed
    assert(got === Set((1L, 10L, 30L), (2L, 5L, 30L),
      (3L, 3L, 15L), (3L, 23L, 15L)))
  }

  test("d27 cap semantics: identical 80-token docs emit capped 64-token runs, then suppress") {
    import spark.implicits._
    val a80 = (1 to 80).map(i => s"a$i").mkString(" ")
    val frame = Seq((4L, a80), (5L, a80)).toDF("doc_id", "text")
    val got = Dedup.maximalDupSpans(frame).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // positions 0..16 all report the cap (their true span extends past
    // it, so none is provably contained in its predecessor); from 17 on
    // the suffix is shorter than the cap and the containment chain
    // suppresses — per doc: 17 capped heads, nothing else
    for (d <- Seq(4L, 5L)) {
      val mine = got.filter(_._1 == d)
      assert(mine.map(r => (r._2, r._3)).toSet ===
        (0 to 16).map(p => (p.toLong, 64L)).toSet, s"doc $d: ${mine.toSeq}")
    }
  }

  test("d31 cross spans: eval overlap reported exactly, train-train ignored, equal-suffix tie caught") {
    import spark.implicits._
    def toks(prefix: String, n: Int): Seq[String] =
      (1 to n).map(i => s"$prefix$i")
    val s20 = toks("s", 20) // span shared train <-> eval
    val t15 = toks("t", 15) // span shared ONLY train <-> train
    val trainA = (toks("u", 7) ++ s20 ++ t15 ++ toks("v", 4)).mkString(" ")
    val trainB = (toks("w", 3) ++ t15 ++ toks("x", 12)).mkString(" ")
    val train = Seq((1L, trainA), (2L, trainB)).toDF("doc_id", "text")
    val evalD = Seq((9L, (s20 ++ toks("e", 6)).mkString(" ")))
      .toDF("doc_id", "text")
    val got = Dedup.crossDupSpans(train, evalD).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // only trainA's s20 copy is contaminated; the train-train t15 repeat
    // must NOT appear (d27 would report it; d31's sides exclude it)
    assert(got === Set((1L, 7L, 20L)))
    // equal-suffix tie: an eval doc IDENTICAL to a train doc sorts on the
    // same key at every position — the side-deterministic descending
    // window must still see it (full-length capped runs, d27 cap shape)
    val same = (1 to 40).map(i => s"q$i").mkString(" ")
    val got2 = Dedup.crossDupSpans(
      Seq((3L, same)).toDF("doc_id", "text"),
      Seq((8L, same)).toDF("doc_id", "text")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got2 === Set((3L, 0L, 40L)))
  }

  test("t39 fertility reconciles with t25's segmentation totals and metric bounds") {
    val fert = run("t39_fertility").collect()
    assert(fert.nonEmpty)
    // per-lang invariants: every word yields >= 1 token, every token
    // carries >= 1 char, and the ratios restate the integer columns
    fert.foreach { r =>
      val (w, c, t) = (r.getAs[Long]("n_words"), r.getAs[Long]("n_chars"),
        r.getAs[Long]("n_bpe_tokens"))
      assert(t >= w && c >= t, s"lang ${r.getString(0)}: w=$w c=$c t=$t")
      assert(math.abs(r.getAs[Double]("fertility") - t.toDouble / w) < 1e-12)
      assert(math.abs(
        r.getAs[Double]("chars_per_token") - c.toDouble / t) < 1e-12)
    }
    // the corpus-total token spend must be EXACTLY t25's (one shared
    // merge sidecar, same segmentation kernel, different rollup grain)
    val t25Total = run("t25_bpe_apply").collect()
      .map(_.getAs[Long]("n_tokens")).sum
    assert(fert.map(_.getAs[Long]("n_bpe_tokens")).sum === t25Total)
  }

  test("d09 components: pairs land in one cluster, canonical is the min, sizes add up") {
    val pairs = run("d02_ngram_jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val comp = run("d09_dedup_components").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(comp.nonEmpty)
    // every edge's endpoints share a component
    pairs.foreach { case (a, b) =>
      assert(comp(a)._1 === comp(b)._1, s"pair ($a,$b) split across components")
    }
    // node set is exactly the docs that appear in pairs
    assert(comp.keySet === pairs.flatMap(p => Seq(p._1, p._2)).toSet)
    // canonical is the member min; size equals the member count
    comp.groupBy(_._2._1).foreach { case (canon, members) =>
      assert(canon === members.keys.min)
      assert(members.values.map(_._2).toSet === Set(members.size.toLong))
    }
  }

  test("d09 components: a 60-diameter path converges to one min-labeled cluster") {
    // The pre-round-5 min-label loop capped at 20 rounds and SILENTLY
    // emitted split components on any graph deeper than the cap — this
    // path needs 60 propagation hops, but large/small-star collapses it in
    // O(log n) rounds. Also proves zero session-cache leakage.
    import spark.implicits._
    val pairs = (0L until 60L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val labels = Dedup.connectedComponents(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(labels.length === 61)
    assert(labels.forall(_._2 == 0L),
      s"mislabeled nodes: ${labels.filter(_._2 != 0L).take(5).toSeq}")
    assert(spark.sharedState.cacheManager.isEmpty,
      "connectedComponents leaked a persisted frame into the session cache")
  }

  test("d09 components: non-convergence fails loudly instead of mislabeling") {
    import spark.implicits._
    val pairs = (0L until 40L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    // a cap of 1 round cannot settle a 40-hop path: require the THROW —
    // the alternative (plausible-looking partial labels) was the defect
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponents(pairs, maxRounds = 1)
    }
    assert(e.getMessage.contains("did not converge"))
    assert(spark.sharedState.cacheManager.isEmpty,
      "failed run left persisted frames behind")
  }

  test("m03 frame arithmetic: counts, energy and peak match a direct recompute") {
    val frames = run("m03_audio_features").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    val docs = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    var checked = 0
    docs.foreach { case (id, text) =>
      val cps = text.codePoints().toArray
      val nf = if (cps.length < 64) 0 else (cps.length - 64) / 32 + 1
      assert(frames.keys.count(_._1 == id) === nf)
      (0 until nf).foreach { f =>
        val w = cps.slice(f * 32, f * 32 + 64).map(_.toLong)
        assert(frames((id, f.toLong)) === ((w.map(c => c * c).sum, w.max)))
        checked += 1
      }
    }
    assert(checked > 0)
  }

  test("m04 patches: 16 per qualifying doc, sums tile the 256-cp image exactly") {
    val patches = run("m04_patch_grid").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val docs = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).codePoints().toArray)
    val byDoc = patches.groupBy(_._1)
    docs.foreach { case (id, cps) =>
      if (cps.length < 256) assert(!byDoc.contains(id))
      else {
        val g = byDoc(id)
        assert(g.length === 16)
        assert(g.map(p => (p._2, p._3)).toSet ===
          (for (r <- 0L until 4L; c <- 0L until 4L) yield (r, c)).toSet)
        // the 16 patch sums partition the image: together they add to the
        // sum of the first 256 codepoints
        assert(g.map(_._4).sum === cps.take(256).map(_.toLong).sum)
      }
    }
    assert(byDoc.nonEmpty)
  }

  test("s06 PQ re-rank: ranks contiguous, cosines descending, beats raw ADC") {
    val rows = run("s06_knn_pq").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, g) =>
      val sorted = g.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1 to sorted.length))
      // cosine non-increasing with rank (exact re-rank ordering)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4 >= b._4)
        case _ =>
      }
      assert(g.forall(r => r._3 != r._1), "self must be excluded")
    }
  }

  test("d02 jaccard values are in (0.5, 1] and pairs are ordered") {
    run("d02_ngram_jaccard").collect().foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0.5 && j <= 1.0)
    }
  }

  test("d01 exact-dedup: canonical is group min; group sizes consistent") {
    val rows = run("d01_exact_dedup").collect()
    val byHash = rows.groupBy(_.getAs[String]("content_hash"))
    byHash.values.foreach { g =>
      val ids = g.map(_.getAs[Long]("doc_id"))
      assert(g.forall(_.getAs[Long]("canonical_id") == ids.min))
      assert(g.forall(_.getAs[Long]("group_size") == g.length))
    }
  }

  test("d04 simhash is deterministic and 60-bit") {
    val a = run("d04_simhash").collect().map(r => r.getLong(0) -> r.getLong(1))
    val b = run("d04_simhash").collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(a.toSeq === b.toSeq)
    assert(a.forall { case (_, h) => h >= 0 && h < (1L << 60) })
  }

  test("d11 banded join equals the all-pairs Hamming<=3 set (pigeonhole lossless)") {
    // independent recompute: brute-force all-pairs over d04's sketches —
    // the banded equi-join must find EXACTLY this set, because a pair
    // differing in <=3 of 60 bits must agree on one of 4 disjoint 15-bit
    // bands
    val sk = run("d04_simhash").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val want = (for {
      i <- sk.indices.iterator
      j <- (i + 1) until sk.length
      h = java.lang.Long.bitCount(sk(i)._2 ^ sk(j)._2)
      if h <= 3
    } yield (sk(i)._1, sk(j)._1, h.toLong)).toSet
    val got = run("d11_simhash_hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want)
    assert(got.nonEmpty, "fixture should contain sketch-close pairs")
  }

  test("d12 decontamination matches a driver-side 13-gram overlap recompute") {
    val docs = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase(java.util.Locale.ROOT)
          .trim.split("\\s+").filter(_.nonEmpty))
    def grams(t: Array[String]): Array[String] =
      t.sliding(13).filter(_.length == 13).map(_.mkString(" ")).toArray
    val evalSet = docs.filter(_._1 % 10 == 7).flatMap(d => grams(d._2)).toSet
    val want = docs.filter(_._1 % 10 != 7).flatMap { case (id, toks) =>
      val hits = grams(toks).zipWithIndex.filter(g => evalSet.contains(g._1))
      if (hits.isEmpty) None
      else Some((id, hits.length.toLong, hits.map(_._2.toLong).min))
    }.toSet
    val got = run("d12_decontaminate").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want)
    assert(got.nonEmpty, "fixture should contain eval-overlapping docs")
  }

  test("d04 simhash: near-duplicate pairs are closer than unrelated pairs") {
    val sim = run("d04_simhash").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nearPairs = run("d02_ngram_jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val nearD = nearPairs.map { case (a, b) => ham(sim(a), sim(b)) }
    // unrelated baseline: consecutive non-near pairs
    val nearSet = nearPairs.toSet
    val ids = sim.keys.toSeq.sorted
    val farD = ids.zip(ids.tail)
      .filterNot(nearSet.contains).take(50)
      .map { case (a, b) => ham(sim(a), sim(b)) }
    assert(nearD.nonEmpty && farD.nonEmpty)
    assert(nearD.sum.toDouble / nearD.size < farD.sum.toDouble / farD.size,
      s"near mean ${nearD.sum.toDouble / nearD.size} should be < far mean ${farD.sum.toDouble / farD.size}")
  }

  test("s01 brute-force kNN: ranks contiguous 1..5 per query, no self-match") {
    val rows = run("s01_knn_bruteforce").collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, g) =>
      assert(g.map(_.getAs[Int]("rank")).sorted.toSeq === (1 to 5))
      assert(g.forall(_.getAs[Long]("neighbor_id") != q))
    }
  }

  test("s02 LSH kNN results are a subset of each query's bucket, ranked") {
    val rows = run("s02_knn_lsh").collect()
    rows.groupBy(_.getLong(0)).foreach { case (q, g) =>
      val ranks = g.map(_.getAs[Int]("rank")).sorted.toSeq
      assert(ranks === (1 to ranks.length)) // contiguous, ≤3
      assert(ranks.length <= 3)
      assert(g.map(_.getAs[Long]("bucket")).distinct.length === 1)
      assert(g.forall(_.getAs[Long]("neighbor_id") != q))
    }
  }

  test("t01/t02: ratios bounded, token accounting consistent") {
    run("t01_token_stats").collect().foreach { r =>
      val nTok = r.getAs[Long]("n_tokens"); val nTyp = r.getAs[Long]("n_types")
      assert(nTyp <= nTok)
      val ttr = r.getAs[Double]("ttr")
      assert(ttr > 0 && ttr <= 1.0)
    }
    run("t02_quality_score").collect().foreach { r =>
      Seq("alpha_ratio", "digit_ratio", "stop_frac").foreach { c =>
        val v = r.getAs[Double](c)
        assert(v >= 0.0 && v <= 1.0, s"$c=$v")
      }
    }
  }

  test("s05 multi-probe top-1 dominates single-bucket s02 top-1 (superset probes)") {
    // multiprobe searches the s02 bucket plus 8 Hamming-1 buckets — a
    // strict candidate superset — so its best neighbor must be at least
    // as close; verify with driver-side cosine recompute
    val vecs = graft.core.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def cos(a: Long, b: Long): Double = {
      val (x, y) = (vecs(a), vecs(b))
      var (d, nx, ny) = (0.0, 0.0, 0.0)
      for (i <- x.indices) { d += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i) }
      d / math.sqrt(nx * ny)
    }
    def top1(name: String) = run(name).collect()
      .filter(_.getAs[Int]("rank") == 1)
      .map(r => r.getLong(0) -> r.getAs[Long]("neighbor_id")).toMap
    val s1 = top1("s02_knn_lsh")
    val m1 = top1("s05_knn_lsh_multiprobe")
    assert(s1.keySet.subsetOf(m1.keySet),
      "multiprobe must answer every query single-probe answers")
    s1.foreach { case (q, n) =>
      assert(cos(q, m1(q)) >= cos(q, n) - 1e-12,
        s"query $q: multiprobe top-1 worse than single-probe")
    }
  }

  test("t05 repetition metrics match a naive independent recompute") {
    // independent formulation: group-by over sliding windows, no hash
    // maps — guards the kernel against off-by-ones and tie-break slips
    val docs = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = run("t05_repetition").collect()
    assert(got.length === docs.size)
    got.foreach { r =>
      val text = docs(r.getLong(0))
      val toks = text.split(" ").filter(_.nonEmpty).toSeq
      val bg = toks.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
      val tg = toks.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSeq
      assert(r.getLong(1) === bg.size.toLong)
      if (bg.nonEmpty) {
        assert(r.getDouble(2) === 1.0 - bg.distinct.size * 1.0 / bg.size)
        val top = bg.groupBy(identity).view.mapValues(_.size).toSeq
          .minBy { case (g, c) => (-c, g) } // ASCII fixture: String order = UTF-8 order
        assert(r.getString(5) === top._1)
        assert(r.getDouble(6) === top._1.length * top._2 * 1.0 / text.length)
      } else assert(r.isNullAt(2) && r.isNullAt(5))
      if (tg.nonEmpty)
        assert(r.getDouble(3) === 1.0 - tg.distinct.size * 1.0 / tg.size)
      if (toks.nonEmpty) {
        val m = toks.groupBy(identity).values.map(_.size).max
        assert(r.getDouble(4) === m * 1.0 / toks.size)
      }
    }
  }

  test("t06 quality filter: verdicts consistent with t01/t05 signals, both classes present") {
    val t01 = run("t01_token_stats").collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_tokens")).toMap
    val t05 = run("t05_repetition").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    val rows = run("t06_quality_filter").collect()
    assert(rows.length === t01.size)
    val allowed = Set("too_short", "too_long", "word_length",
      "symbol_heavy", "no_stopwords", "repetitive")
    rows.foreach { r =>
      val id = r.getLong(0)
      val reason = Option(r.getAs[String]("drop_reason"))
      assert(r.getAs[Boolean]("keep") === reason.isEmpty)
      assert(reason.forall(allowed.contains))
      // n_words is t01's token count; dup_bigram_frac is t05's, exactly
      assert(r.getAs[Long]("n_words") === t01(id))
      assert((if (r.isNullAt(5)) None else Some(r.getDouble(5))) === t05(id))
      if (reason.contains("too_short")) assert(t01(id) < 20)
      if (reason.contains("repetitive")) assert(t05(id).exists(_ > 0.1))
      if (reason.isEmpty) {
        assert(t01(id) >= 20)
        assert(t05(id).forall(_ <= 0.1))
      }
    }
    assert(rows.exists(_.getAs[Boolean]("keep")), "fixture should keep docs")
    assert(rows.exists(!_.getAs[Boolean]("keep")), "fixture should drop docs")
  }

  test("t07 mixture sample: exact deterministic keep set, per-language rates honored") {
    val docs = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val rates = Map("en" -> 1000L, "es" -> 500L, "fr" -> 500L,
      "de" -> 250L, "zh" -> 100L)
    val want = docs.filter { case (id, lang) =>
      graft.functions.Portable.h60Scala(s"mix_$id") % 1000 <
        rates.getOrElse(lang, 50L)
    }.map(_._1).toSet
    val got = run("t07_mixture_sample").collect().map(_.getLong(0)).toSet
    assert(got === want)
    // en is rate-1.0: every English doc survives
    val en = docs.filter(_._2 == "en").map(_._1).toSet
    assert(en.subsetOf(got))
    // downsampled languages actually lose documents
    val zh = docs.filter(_._2 == "zh").map(_._1).toSet
    assert((zh -- got).nonEmpty, "zh at 10% should drop docs")
  }

  test("t08 sequence packing: offsets within budget, chunks fill contiguously per shard") {
    val rows = run("t08_sequence_pack").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (_, shard) =>
      val ordered = shard.sortBy(_._1)
      // running sum is consistent and seq assignment derives from it
      var cum = 0L
      ordered.foreach { case (_, _, n, c, seqId, off) =>
        assert(c === cum + n)
        assert(seqId === cum / 2048)
        assert(off === cum % 2048)
        assert(off >= 0 && off < 2048)
        cum = c
      }
      // seq ids are nondecreasing and start at 0
      assert(ordered.head._5 === 0L && ordered.head._6 === 0L)
      assert(ordered.map(_._5).sliding(2).forall {
        case Array(a, b) => a <= b
        case _ => true
      })
    }
  }

  test("t09 funnel: stages partition each group and agree with t06/d01/t07/t01") {
    val meta = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "source", "lang").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    val keepQ = run("t06_quality_filter").collect()
      .map(r => r.getLong(0) -> r.getAs[Boolean]("keep")).toMap
    val hashOf = run("d01_exact_dedup").collect()
      .map(r => r.getLong(0) -> r.getAs[String]("content_hash")).toMap
    val mixKeep = run("t07_mixture_sample").collect().map(_.getLong(0)).toSet
    val nTok = run("t01_token_stats").collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_tokens")).toMap
    // funnel dedup canonicals are over QUALITY SURVIVORS only (not d01's
    // whole-corpus canonicals — the funnel order matters)
    val canon = meta.keys.filter(keepQ).toSeq.groupBy(hashOf)
      .flatMap { case (_, ids) => ids.map(_ -> ids.min) }
    def stage(id: Long): String =
      if (!keepQ(id)) "quality"
      else if (id != canon(id)) "duplicate"
      else if (!mixKeep(id)) "mixture"
      else "kept"
    val want = meta.toSeq.groupBy(_._2).map { case ((src, lang), ds) =>
      val stages = ds.map(d => (d._1, stage(d._1)))
      (src, lang) -> (ds.size.toLong,
        stages.count(_._2 == "quality").toLong,
        stages.count(_._2 == "duplicate").toLong,
        stages.count(_._2 == "mixture").toLong,
        stages.count(_._2 == "kept").toLong,
        stages.filter(_._2 == "kept").map(s => nTok(s._1)).sum)
    }
    val got = run("t09_pipeline_funnel").collect().map { r =>
      (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))
    }.toMap
    assert(got === want)
    // counts partition: every group's stage counts add to n_docs
    got.values.foreach { case (n, q, du, m, k, _) => assert(q + du + m + k === n) }
  }

  test("t10/t11 vocabulary and rarity agree with a driver-side frequency recompute") {
    val docs = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase(java.util.Locale.ROOT)
          .trim.split("\\s+").filter(_.nonEmpty))
    val tf = docs.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val df = docs.flatMap { case (id, ts) => ts.distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.size.toLong).toMap
    // tf ties break in UTF-8 BYTE order (Spark's binary string sort), not
    // Scala's UTF-16 order — they differ for supplementary-plane tokens
    def utf8Lt(a: String, b: String): Boolean =
      java.util.Arrays.compareUnsigned(
        a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        b.getBytes(java.nio.charset.StandardCharsets.UTF_8)) < 0
    val wantTop = tf.toSeq.map { case (t, f) => (t, f, df(t)) }
      .sortWith { case ((ta, fa, _), (tb, fb, _)) =>
        fa > fb || (fa == fb && utf8Lt(ta, tb))
      }.take(100)
    val gotTop = run("t10_vocab_stats").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(gotTop === wantTop)
    val ndocs = docs.count(_._2.nonEmpty).toLong
    val rows = run("t11_token_rarity").collect()
    assert(rows.length === docs.count(_._2.nonEmpty))
    val byId = docs.toMap
    rows.foreach { r =>
      val toks = byId(r.getLong(0))
      assert(r.getLong(1) === toks.length.toLong)
      assert(r.getLong(2) === toks.map(tf).sum)
      val nRare = toks.count(t => df(t) * 20 <= ndocs)
      assert(r.getDouble(4) === nRare * 1.0 / toks.length)
    }
    assert(rows.exists(_.getDouble(4) > 0),
      "fixture should contain rare-token docs")
  }

  test("q37 deterministic moments equal Spark's built-in statistics (tolerance)") {
    // the decimal-power-sum formulation must compute the SAME statistic
    // the built-ins do — only the float-accumulation order differs
    import org.apache.spark.sql.functions._
    val ev = graft.core.Tables.events(spark, sf).select(col("event_type"),
      col("value").as("x"), hour(col("ts")).cast("double").as("y"))
    val builtin = ev.groupBy("event_type").agg(
      avg(col("x")).as("m"), var_samp(col("x")).as("v"),
      stddev_samp(col("x")).as("sd"), corr(col("x"), col("y")).as("c"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val got = run("q37_moment_battery").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (m, v, sd, c) = builtin(r.getString(0))
      assert(math.abs(r.getDouble(2) - m) <= 1e-9 * math.max(1, math.abs(m)))
      assert(math.abs(r.getDouble(3) - v) <= 1e-9 * math.max(1, math.abs(v)))
      assert(math.abs(r.getDouble(4) - sd) <= 1e-9 * math.max(1, math.abs(sd)))
      assert(math.abs(r.getDouble(5) - c) <= 1e-6,
        s"corr ${r.getDouble(5)} vs builtin $c")
    }
  }

  test("t03 langid: predictions come from the marker set and flags match") {
    val langs = Set("en", "es", "fr", "de", "zh", "und")
    run("t03_langid").collect().foreach { r =>
      val pred = r.getAs[String]("predicted")
      assert(langs.contains(pred))
      assert(r.getAs[Boolean]("is_correct") ===
        (pred == r.getAs[String]("lang_label")))
    }
  }

  test("t28 n-gram profiles classify planted character distributions; t03's markers can't") {
    import spark.implicits._
    // three synthetic "languages" with genuinely distinct CHARACTER
    // distributions but no marker token anywhere — the regime where the
    // trained profile works and the marker screen is blind. Train docs
    // (id%5<>4) build the profiles; held-out docs (id%5=4) classify.
    val enWords = Seq("alpha", "apple", "anchor", "animal", "arrival")
    val esWords = Seq("zorro", "azulejo", "zumbido", "razon", "zarza")
    val zhWords = Seq("mmkqq", "qkmmp", "kqpmm", "pqkmq", "mqkpp")
    def mk(words: Seq[String], seed: Int): String =
      (0 until 40).map(i => words((i * 7 + seed) % words.size)).mkString(" ")
    val rows = Seq(
      ("en", enWords), ("es", esWords), ("zh", zhWords)
    ).zipWithIndex.flatMap { case ((lang, words), li) =>
      (0 to 4).map(k => (li * 5L + k, lang, mk(words, k)))
    }
    val frame = rows.toDF("doc_id", "lang", "text")
    val got = TextAnalysis.ngramLangId(frame).collect()
    assert(got.length === 3, "one held-out doc per planted language")
    got.foreach { r =>
      assert(r.getAs[Boolean]("is_correct"),
        s"doc ${r.getLong(0)} labeled ${r.getAs[String]("lang_label")} " +
          s"predicted ${r.getAs[String]("predicted")}")
      assert(r.getAs[Long]("n_profile") > 0)
      // the correct language's distance is a STRICT argmin here
      val mine = r.getAs[Long](s"dist_${r.getAs[String]("lang_label")}")
      val others = Seq("en", "es", "fr", "de", "zh")
        .filterNot(_ == r.getAs[String]("lang_label"))
        .map(l => r.getAs[Long](s"dist_$l"))
      assert(others.forall(_ > mine), s"argmin not strict: $mine vs $others")
    }
  }

  test("t28 on the ScaleGen multilingual fixture: held-out accuracy clears 0.9 (chance is 0.2)") {
    // the corpus-scale version of the planted-distribution test: 500
    // docs over five per-language character distributions
    // (ScaleGen.multilingualDocs — Latin languages separated by n-gram
    // statistics, zh by script). The driver corpus can't ground this
    // number (one shared vocabulary → chance, documented at the t28
    // gate); here the trained profile must actually classify.
    val frame = graft.ScaleGen.multilingualDocs(spark, 500)
    val got = TextAnalysis.ngramLangId(frame).collect()
    assert(got.length === 100, "doc_id%5=4 holds out 100 of 500")
    val byLang = got.groupBy(_.getAs[String]("lang_label"))
    assert(byLang.keySet === Set("en", "es", "fr", "de", "zh"),
      "every language must appear in the held-out slice")
    val acc = got.count(_.getAs[Boolean]("is_correct")).toDouble / got.length
    assert(acc >= 0.9, s"held-out accuracy $acc below the 0.9 floor")
    // script-distinct zh must be perfect — its trigrams share nothing
    // with the Latin profiles
    val zh = byLang("zh")
    assert(zh.forall(_.getAs[Boolean]("is_correct")),
      "zh (script-distinct) must classify perfectly")
  }

  test("t28: docs with no trigram still get a scored row (und, zero distances)") {
    import spark.implicits._
    val frame = Seq(
      (0L, "en", "alpha beta gamma delta"), (1L, "en", "beta alpha gamma"),
      (2L, "en", "gamma delta alpha"), (3L, "en", "delta gamma beta"),
      (4L, "en", "x"), (9L, "es", null.asInstanceOf[String])
    ).toDF("doc_id", "lang", "text")
    val got = TextAnalysis.ngramLangId(frame).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.keySet === Set(4L, 9L))
    Seq(4L, 9L).foreach { id =>
      assert(got(id).getAs[Long]("n_profile") === 0L)
      assert(got(id).getAs[String]("predicted") === "und")
      assert(!got(id).getAs[Boolean]("is_correct"))
    }
  }

  test("t29 registrable-domain extraction: multi-label suffixes, deep subdomains, two-label fallback") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val cases = Seq(
      ("www.src6.co.uk", "src6.co.uk"),
      ("a.b.c.src6.co.uk", "src6.co.uk"),
      ("src6.co.uk", "src6.co.uk"),
      ("cdn.images.example.ac.uk", "example.ac.uk"),
      ("example.com", "example.com"),
      ("deep.sub.example.org", "example.org"),
      ("colors.co.net", "co.net")) // 'co' is only special under .uk here
    val got = cases.map(_._1).toDF("host")
      .select(col("host"), TextAnalysis.registrableOf(col("host")).as("d"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (h, want) =>
      assert(got(h) === want, s"host $h")
    }
  }

  test("t29 gate: planted blocklist flags exactly its live domains; dup mass ties to t24") {
    val rows = run("t29_domain_gate").collect()
    val blocked = rows.filter(_.getAs[Boolean]("blocked"))
      .map(_.getAs[String]("domain")).toSet
    // example.com is in the blocklist but no corpus doc maps to it —
    // the gate must flag exactly the LIVE entries
    assert(blocked === Set("src6.co.uk", "src12.org"))
    rows.foreach { r =>
      assert(r.getAs[String]("verdict") ===
        (if (r.getAs[Boolean]("blocked")) "toss_blocklist" else "keep"))
    }
    // same content-hash dup definition as t24: totals must reconcile
    val t24 = run("t24_dataset_card").collect()
    assert(rows.map(_.getAs[Long]("n_dup_docs")).sum ===
      t24.map(_.getAs[Long]("n_dup_docs")).sum)
    assert(rows.map(_.getAs[Long]("n_docs")).sum ===
      t24.map(_.getAs[Long]("n_docs")).sum)
  }

  test("t04 fingerprints: equal texts ⇒ equal prints, distinct docs mostly differ") {
    val fps = run("t04_fingerprint").collect().map(_.getAs[Long]("fp_full"))
    // md5-based 60-bit prints on 500 distinct docs: collisions ~1e-14
    assert(fps.distinct.length === fps.length)
  }

  test("t04/m01 kernels pin to codepoints on non-ASCII text (oracle twin)") {
    // Twin of the DuckDB formulas over text with 2- and 3-byte UTF-8 chars:
    // unicode(substr(s,i,1)) == Java codePointAt; octet_length(encode(s))
    // == UTF-8 byte count. Locks the byte-vs-codepoint choice in.
    val s = "héllo 世界 the end"
    val cps = s.codePoints().toArray
    // graft_rolling_hash over codepoints, not Spark ascii() bytes
    import spark.implicits._
    graft.plans.VectorExpressions.register(spark)
    val got = Seq(s).toDF("t")
      .select(org.apache.spark.sql.functions
        .call_function("graft_rolling_hash", org.apache.spark.sql.functions.col("t")))
      .as[Long].head()
    val want = cps.foldLeft(0L)((h, c) => (h * 31 + c) % 2147483647L)
    assert(got === want)
    // multimodal decode stub: n_bytes from UTF-8 payload, checksum from
    // the first 16 codepoints of the decoded text
    val rec = Multimodal.MediaRecord(7L, s.getBytes("UTF-8"), "media/x")
    val meta = Multimodal.decodeOne(rec)
    assert(meta.n_bytes === s.getBytes("UTF-8").length.toLong)
    assert(meta.cp_sum16 === cps.take(16).map(_.toLong).sum)
    assert(meta.n_frames === s.getBytes("UTF-8").length / 100 + 1)
  }

  test("s07 IVF+PQ: ADC stage scans exactly one inverted list per query") {
    // the point of composing IVF with PQ: the ADC join input must hold one
    // row per (query, member of the query's SINGLE probed list) — never
    // the whole corpus per query (s06's deliberate shape)
    val adc = Similarity.ivfpqAdcInput(spark, sf)
      .select("query_id", "probe_label", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(adc.nonEmpty)
    val emb = graft.core.Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "cast(label as long)").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val labelOf = emb.toMap
    val listSizes = emb.groupBy(_._2).map { case (l, g) => l -> g.size }
    val corpus = emb.length
    val byQ = adc.groupBy(_._1)
    byQ.foreach { case (q, rows) =>
      val probed = rows.map(_._2).distinct
      assert(probed.length === 1, s"query $q probed ${probed.length} lists")
      val l = probed.head
      val expect = listSizes(l) - (if (labelOf(q) == l) 1 else 0)
      assert(rows.length === expect,
        s"query $q: ADC input ${rows.length} != list size $expect")
      assert(rows.map(_._3).forall(v => labelOf(v) == l))
    }
    assert(adc.length < corpus * byQ.size,
      "ADC stage scanned as much as the unpruned corpus")
  }

  test("s07 IVF+PQ: ranks contiguous, cosines descending, no self-match") {
    val rows = run("s07_knn_ivfpq").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (q, g) =>
      val sorted = g.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1 to sorted.length))
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4 >= b._4)
        case _ =>
      }
      assert(g.forall(_._3 != q), "self must be excluded")
    }
  }

  test("d10 capped spans = d08 minus spans hotter than 1% of span-bearing docs") {
    val d08 = run("d08_dup_spans").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // the cap population: docs holding at least one 12-token window
    val ndocs = graft.core.Tables.documents(spark, sf)
      .select("text").collect()
      .count(_.getString(0).trim.split("\\s+").count(_.nonEmpty) >= 12)
    val want = d08.filter(_._4 * 100 <= ndocs).toSet
    val got = run("d10_capped_spans").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === want)
    assert(got.nonEmpty, "cap must not empty the fixture's shared-span set")
    assert(got.subsetOf(d08.toSet))
  }

  test("m01/m02: decode stub arithmetic and frame sampling line up") {
    val meta = run("m01_media_decode").collect()
    meta.foreach { r =>
      val bs = r.getAs[Long]("cp_sum16")
      assert(r.getAs[Long]("width") === 64 + (bs * 31) % 1857)
      assert(r.getAs[Long]("height") === 64 + (bs * 17) % 1017)
      assert(Seq("jpeg", "png", "webp").contains(r.getAs[String]("codec")))
      assert(r.getAs[Long]("n_frames") === r.getAs[Long]("n_bytes") / 100 + 1)
    }
    val nFrames = meta.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("n_frames")).toMap
    val frames = run("m02_frame_sample").collect()
    frames.groupBy(_.getAs[Long]("doc_id")).foreach { case (id, g) =>
      val expect = (0L until nFrames(id) by 7).toSeq
      assert(g.map(_.getAs[Long]("frame_idx")).sorted.toSeq === expect)
    }
  }

  test("t12 diversity moments agree with t01's Catalyst counts and their identities") {
    // t01 computes n_tokens/n_types through column expressions, t12
    // through the hash-map kernel — the two formulations must agree doc
    // by doc, and the derived columns must satisfy their definitions
    val t01 = run("t01_token_stats").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val rows = run("t12_lexical_diversity").collect()
    assert(rows.length === t01.size)
    rows.foreach { r =>
      val (id, n, types) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val (sq, gini, rep, hapax) =
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      assert((n, types) === t01(id), s"doc $id: kernel vs Catalyst counts")
      assert(gini === n * n - sq)
      assert(rep === n - types)
      assert(hapax >= 0 && hapax <= types)
      // Σc² bounds: all-distinct (=n) up to one-type (=n²)
      assert(sq >= n && sq <= n * n)
      if (n > 1) {
        val gs = r.getAs[Double]("gini_simpson")
        assert(gs >= 0.0 && gs <= 1.0)
        assert(math.abs(gs - gini.toDouble / (n * (n - 1))) < 1e-12)
      }
    }
  }

  test("s08 nprobe=2 candidates superset s03's, so top-1 can only improve") {
    val vecs = graft.core.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def cos(a: Long, b: Long): Double = {
      val (x, y) = (vecs(a), vecs(b))
      var (d, nx, ny) = (0.0, 0.0, 0.0)
      for (i <- x.indices) { d += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i) }
      d / math.sqrt(nx * ny)
    }
    val s3 = run("s03_knn_ivf").collect()
      .filter(_.getAs[Int]("rank") == 1)
      .map(r => r.getLong(0) -> r.getAs[Long]("neighbor_id")).toMap
    val s8rows = run("s08_knn_ivf_multiprobe").collect()
    // every returned neighbor came from probe 1 or 2, never elsewhere
    assert(s8rows.forall(r => Set(1, 2).contains(r.getAs[Int]("probe_rank"))))
    val s8 = s8rows.filter(_.getAs[Int]("rank") == 1)
      .map(r => r.getLong(0) -> r.getAs[Long]("neighbor_id")).toMap
    assert(s3.keySet.subsetOf(s8.keySet),
      "nprobe=2 must answer every query nprobe=1 answers")
    s3.foreach { case (q, n) =>
      assert(cos(q, s8(q)) >= cos(q, n) - 1e-12,
        s"query $q: second probe made the answer worse")
    }
  }

  test("d13 SemDeDup pairs match a driver-side recompute of the clustered pair scan") {
    // independent recompute: double-precision label centroids, argmax
    // assignment, within-cluster pairs at cosine >= 0.35, best lower-id
    // keeper per dup — the s04-spec methodology extended to the pair stage
    val raw = graft.core.Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "embedding", "cast(label as long)").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray,
        r.getLong(2)))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def nrm(a: Array[Double]) = math.sqrt(dot(a, a))
    val cents = raw.groupBy(_._3).map { case (l, g) =>
      val c = new Array[Double](64)
      g.foreach(v => for (i <- c.indices) c(i) += v._2(i))
      for (i <- c.indices) c(i) /= g.length
      l -> c
    }
    val assign = raw.map { case (id, v, _) =>
      id -> cents.toSeq.map { case (l, c) =>
        (dot(v, c) / (nrm(v) * nrm(c)), l)
      }.maxBy { case (c2, l) => (c2, -l) }._2
    }.toMap
    val byId = raw.map(t => t._1 -> t._2).toMap
    val ids = raw.map(_._1).sorted
    val pairs = for {
      i <- ids.indices; j <- (i + 1) until ids.length
      a = ids(i); b = ids(j)
      if assign(a) == assign(b)
      c = dot(byId(a), byId(b)) / (nrm(byId(a)) * nrm(byId(b)))
      if c >= 0.35
    } yield (b, a, c) // (dup, keeper, cosine)
    val want = pairs.groupBy(_._1).map { case (dup, g) =>
      val best = g.maxBy { case (_, keep, c) => (c, -keep) }
      dup -> (best._2, assign(dup))
    }
    val got = run("d13_semantic_dedup").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.nonEmpty, "fixture corpus must contain semantic near-dups")
    assert(got === want)
  }

  test("d14 signature estimates track d02's exact Jaccard within binomial error") {
    val exact = run("d02_ngram_jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("jaccard")).toMap
    val est = run("d14_minhash_estimate").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("est_jaccard")).toMap
    assert(est.nonEmpty)
    // every strong true pair must survive estimation: at J >= 0.85 the
    // chance of fewer than 15/30 agreeing components is ~0
    val strong = exact.filter(_._2 >= 0.85).keySet
    assert(strong.nonEmpty && strong.subsetOf(est.keySet),
      s"estimator dropped strong pairs: ${(strong -- est.keySet).take(5)}")
    // and on the shared pairs the estimate sits within a generous 5-sigma
    // binomial envelope of the exact value (sigma = sqrt(J(1-J)/30))
    est.foreach { case (pair, e) =>
      exact.get(pair).foreach { j =>
        val sigma = math.sqrt(j * (1 - j) / 30.0)
        assert(math.abs(e - j) <= 5 * sigma + 1e-9,
          s"pair $pair: estimate $e vs exact $j exceeds 5 sigma")
      }
    }
  }

  test("t17 chunks tile every document: full coverage, exact stride, C-bounded, tail flush") {
    // the oracle pins Spark ≡ DuckDB; this pins that the shared formula
    // actually CHUNKS — an off-by-one identical in both engines would
    // pass the hash gate but drop/duplicate tokens here
    val nTok = run("t01_token_stats").collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_tokens")).toMap
    val byDoc = run("t17_chunking").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("chunk_idx"),
        r.getAs[Long]("chunk_start"), r.getAs[Long]("n_chunk_tokens")))
      .groupBy(_._1)
    nTok.foreach { case (id, n) =>
      val chunks = byDoc.getOrElse(id, Array.empty).sortBy(_._2)
      if (n == 0) assert(chunks.isEmpty, s"doc $id: empty doc must emit no chunks")
      else {
        assert(chunks.head._3 === 1L, s"doc $id: first chunk must start at token 1")
        assert(chunks.map(_._2).toSeq === chunks.indices.map(_.toLong),
          s"doc $id: chunk indices must be contiguous from 0")
        chunks.foreach { case (_, i, start, len) =>
          assert(start === i * 48 + 1, s"doc $id chunk $i: stride must be exactly 48")
          assert(len >= 1 && len <= 64, s"doc $id chunk $i: length $len outside (0, C]")
          assert(start + len - 1 <= n, s"doc $id chunk $i: overruns the document")
        }
        val last = chunks.last
        assert(last._3 + last._4 - 1 === n,
          s"doc $id: the last chunk must flush to the final token")
        // union of [start, start+len) covers [1, n]: starts advance by
        // 48 < 64 so consecutive chunks always overlap or touch
        assert(chunks.forall(c => c._3 <= n), s"doc $id: chunk starts past the end")
      }
    }
    assert(nTok.values.sum > 0, "fixture should contain non-empty docs")
  }

  test("t18 scores are internally consistent and discriminate (known <= total, familiarity >= known)") {
    val nTok = run("t01_token_stats").collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_tokens")).toMap
    val rows = run("t18_lm_familiarity").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, nb, nk, fam) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nb === math.max(nTok(id) - 1, 0L),
        s"doc $id: bigram count must be max(n_tokens - 1, 0)")
      assert(nk <= nb, s"doc $id: known occurrences can't exceed total")
      // every known occurrence contributes its reference count (>= 1)
      assert(fam >= nk, s"doc $id: familiarity mass below known count")
      if (nb == 0) assert(r.isNullAt(4), s"doc $id: coverage must be null without bigrams")
      else assert(math.abs(r.getDouble(4) - nk.toDouble / nb) < 1e-15)
    }
    // the pruned LM must actually discriminate: not every doc fully covered
    assert(rows.exists(r => r.getLong(1) > 0 && r.getLong(2) < r.getLong(1)),
      "top-500 prune should leave some bigrams unknown at fixture scale")
  }

  test("d22 containment finds a short-doc-inside-long-doc pair Jaccard is blind to") {
    import spark.implicits._
    // doc 1 is verbatim inside doc 2, which is ~14x longer: containment
    // c(1,2) = 1.0 while J(1,2) ≈ 1/14 — below any useful symmetric
    // threshold. doc 3 is unrelated filler.
    val short = (1 to 12).map(i => s"alpha$i").mkString(" ")
    val long = short + " " + (1 to 160).map(i => s"beta$i").mkString(" ")
    val other = (1 to 80).map(i => s"gamma$i").mkString(" ")
    val docFrame = Seq((1L, short), (2L, long), (3L, other)).toDF("doc_id", "text")
    val rows = Dedup.containmentJoin(docFrame, 0.9).collect()
    assert(rows.length === 1, s"expected exactly (1 ⊏ 2), got ${rows.mkString(";")}")
    val r = rows.head
    assert(r.getLong(0) === 1L && r.getLong(1) === 2L)
    assert(r.getAs[Double]("containment") === 1.0)
    // the same pair's symmetric Jaccard, from the returned exact sizes,
    // is far below the 0.5 d02-family floor — the case this operator exists for
    val j = r.getAs[Long]("intersection").toDouble /
      (r.getAs[Long]("size_a") + r.getAs[Long]("size_b") - r.getAs[Long]("intersection"))
    assert(j < 0.2, s"pair should be Jaccard-invisible, got $j")
  }

  test("d22 on the corpus: bounds, orientation filter, and superset of symmetric pairs") {
    val rows = run("d22_containment").collect()
    assert(rows.nonEmpty, "planted near-dups must qualify as containment pairs")
    rows.foreach { r =>
      val c = r.getAs[Double]("containment")
      assert(c >= 0.9 && c <= 1.0 + 1e-15)
      assert(r.getAs[Long]("intersection") <= r.getAs[Long]("size_a"))
      // the |B| >= t·|A| size bound is implied by c >= t
      assert(r.getAs[Long]("size_b") >= 0.9 * r.getAs[Long]("size_a"))
    }
    // c(A,B) >= J(A,B) always, so every J >= 0.9 pair appears (some orientation)
    val sym = run("d02_ngram_jaccard").collect()
      .filter(_.getAs[Double]("jaccard") >= 0.9)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cont = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sym.forall(p => cont.contains(p) || cont.contains(p.swap)),
      "containment must cover every symmetric-near-dup pair")
  }

  test("s18 descent recall is monotone vs seed on the corpus (structural superset)") {
    val got = run("s18_knn_descent").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val init = r.getAs[Long]("n_init")
      val desc = r.getAs[Long]("n_desc")
      assert(desc >= init,
        s"query ${r.getLong(0)}: descent recall dropped ($init -> $desc)")
      assert(desc <= 5L && init >= 0L)
      assert(r.getAs[Double]("recall_desc") === desc.toDouble / 5)
    }
  }

  test("s18 one descent round strictly improves recall on a planted clustered corpus") {
    import spark.implicits._
    graft.plans.VectorExpressions.register(spark)
    import org.apache.spark.sql.functions.{col, sqrt}
    // 3 well-separated clusters; perturbations scatter each cluster
    // across the sign buckets of both tables, so the SEED graph is
    // imperfect while 2-hop cross-table paths can reach the true
    // neighbors — the regime descent exists for
    val rnd = new scala.util.Random(7L)
    val dim = 64
    val rows = (0 until 90).map { i =>
      val c = i % 3
      val v = Array.tabulate(dim) { k =>
        (if (k == c) 1.0 else 0.0) + 0.25 * (rnd.nextDouble() * 2 - 1)
      }
      (i.toLong, v)
    }
    val vecs = rows.toDF("vec_id", "v")
      .withColumn("nrm", sqrt(graft.functions.Portable.dotFast(col("v"), col("v"))))
    val got = Similarity.knnDescentAudit(vecs, queryMod = 10).collect()
    assert(got.length === 9)
    val init = got.map(_.getAs[Long]("n_init")).sum
    val desc = got.map(_.getAs[Long]("n_desc")).sum
    got.foreach(r => assert(r.getAs[Long]("n_desc") >= r.getAs[Long]("n_init")))
    assert(desc > init,
      s"descent must strictly improve on clustered data: $init -> $desc")
  }

  test("s25 multi-round descent: per-query recall non-decreasing at EVERY round; strict overall progress on the planted corpus") {
    import spark.implicits._
    graft.plans.VectorExpressions.register(spark)
    import org.apache.spark.sql.functions.{col, sqrt}
    // the s18 planted fixture: 3 separated clusters, perturbations
    // scatter each across both tables' sign buckets, so the seed is
    // imperfect and each round's 2-hop frontier has real work to do
    val rnd = new scala.util.Random(7L)
    val dim = 64
    val rows = (0 until 90).map { i =>
      val c = i % 3
      val v = Array.tabulate(dim) { k =>
        (if (k == c) 1.0 else 0.0) + 0.25 * (rnd.nextDouble() * 2 - 1)
      }
      (i.toLong, v)
    }
    val vecs = rows.toDF("vec_id", "v")
      .withColumn("nrm", sqrt(graft.functions.Portable.dotFast(col("v"), col("v"))))
    val got = Similarity.knnDescentRoundsAudit(vecs, rounds = 3, queryMod = 10)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("round"),
        r.getAs[Long]("n_hits")))
    assert(got.length === 9 * 4, "9 queries x rounds 0..3")
    // g_{i+1} is the top-5 of a SUPERSET of g_i's edges, and a true
    // top-5 neighbor can't be displaced — so per-query hits may never
    // decrease at ANY round, not just seed-vs-final
    got.groupBy(_._1).foreach { case (q, rs) =>
      val curve = rs.sortBy(_._2).map(_._3).toSeq
      assert(curve.zip(curve.tail).forall { case (a, b) => b >= a },
        s"query $q: per-round hits regressed ($curve)")
    }
    // and iteration must genuinely converge upward on clustered data:
    // the final round's total strictly beats the seed's
    val byRound = got.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    assert(byRound(3L) > byRound(0L),
      s"3 rounds must strictly improve on the seed: ${byRound.toSeq.sorted}")
    // round 1 here must agree with s18's single-round audit — same seed,
    // same extracted per-round plan
    val s18 = Similarity.knnDescentAudit(vecs, queryMod = 10).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_init"), r.getAs[Long]("n_desc")))
      .sortBy(_._1)
    val r01 = got.filter(t => t._2 <= 1L).groupBy(_._1).view
      .mapValues(rs => (rs.sortBy(_._2).map(_._3))).toMap
    s18.foreach { case (q, i0, i1) =>
      assert(r01(q) === Seq(i0, i1),
        s"query $q: s25 rounds 0/1 (${r01(q)}) must equal s18's audit ($i0, $i1)")
    }
  }

  test("s30 beam search walks a connected ring graph to the query's true neighborhood") {
    import spark.implicits._
    graft.plans.VectorExpressions.register(spark)
    import org.apache.spark.sql.functions.{col, sqrt}
    // a 1-D manifold: 40 unit vectors around a circle (2 active dims,
    // angles jittered so no two cosines tie). The 5-NN graph is the
    // LOCAL ring (±1, ±2 hops), so the only way to answer a query far
    // from the entry (vec 0) is to actually WALK the graph — exactly
    // what best-first beam search claims. Queries 0/4/8 sit 0/4/8 ring
    // steps from the entry; with 5 hops × ±2-step edges all three true
    // neighborhoods are reachable, so recall@5 must be PERFECT, while
    // n_visited stays well under the corpus (the sublinearity claim).
    val n = 40
    val dim = 64
    val rows = (0 until n).map { i =>
      val theta = 2 * math.Pi * (i + 0.05 * math.sin(i * 1.7)) / n
      val v = Array.tabulate(dim)(k =>
        if (k == 0) math.cos(theta) else if (k == 1) math.sin(theta) else 0.0)
      (i.toLong, v)
    }
    val vecs = rows.toDF("vec_id", "v")
      .withColumn("nrm", sqrt(graft.functions.Portable.dotFast(col("v"), col("v"))))
    val got = Similarity.knnBeamSearchAudit(vecs, queryMod = 4, queryCap = 9)
      .collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(0L, 4L, 8L))
    got.foreach { r =>
      assert(r.getAs[Double]("recall_beam") === 1.0,
        s"query ${r.getLong(0)}: beam search must find the full true " +
          s"neighborhood on a connected local graph (got ${r.getAs[Long]("n_hits")}/5)")
      assert(r.getAs[Long]("n_visited") < n,
        s"query ${r.getLong(0)} visited the whole corpus — not a search")
    }
  }

  test("s31 two-layer search dominates s30 at sf0.1: strictly fewer visited nodes, no recall loss, same graph") {
    import org.apache.spark.sql.functions.{col, expr, sqrt}
    graft.plans.VectorExpressions.register(spark)
    // the measured claim of the hierarchical entry (both walks are
    // DETERMINISTIC — fixed graph, entries and tie-breaks — so these
    // are exact counts, not noisy measurements). sf0.1 (5000 vectors)
    // is where a hierarchy can pay; at the sf0.01 gate the corpus
    // diameter (~3 hops) is below what a long-range layer shortens
    val d = "/root/testdata/sf0.1"
    val vecs = graft.core.Tables.embeddings(spark, d)
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("nrm",
        sqrt(graft.functions.Portable.dotFast(col("v"), col("v"))))
    def sums(df: org.apache.spark.sql.DataFrame): (Long, Long, Long) = {
      val rs = df.collect()
      (rs.map(_.getLong(1)).sum, rs.map(_.getLong(2)).sum, rs.length.toLong)
    }
    val (v30, h30, n30) = sums(Similarity.knnBeamSearchAudit(vecs))
    val (v31, h31, n31) = sums(Similarity.knnTwoLayerSearchAudit(vecs))
    assert(n30 === n31 && n30 > 0, "query sets must match and be non-empty")
    assert(v31 < v30,
      s"two-layer search must visit fewer nodes ($v31 !< $v30)")
    assert(h31 >= h30,
      s"visited reduction must not cost recall ($h31 hits < $h30)")
  }

  test("s14 recall curve is monotone in nprobe and consistent with s01 truth size") {
    val rows = run("s14_ivf_recall_curve").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getAs[Double]("recall")))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(1, 2, 4))
    val nq = rows.head._2
    assert(nq > 0)
    rows.foreach { case (_, n, hits, rec) =>
      assert(n === nq)
      assert(hits <= 3 * nq, "can't hit more than the truth rows")
      assert(math.abs(rec - hits.toDouble / (3 * nq)) < 1e-15)
    }
    // probing more lists can only add candidates: recall is non-decreasing
    assert(rows.toSeq.sliding(2).forall { case Seq(a, b) => a._4 <= b._4 + 1e-15 },
      s"recall must be monotone in nprobe: ${rows.mkString(",")}")
  }

  test("t23 epoch schedule: budget conservation and integer-exact ceil") {
    val rows = run("t23_epoch_schedule").collect()
    assert(rows.nonEmpty)
    val budget = 1000000L
    // integer-div split never overshoots the budget
    assert(rows.map(_.getAs[Long]("target_tokens")).sum <= budget)
    rows.foreach { r =>
      val (nt, tt) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("target_tokens"))
      val (ep, rep) = (r.getAs[Double]("epochs"), r.getAs[Long]("n_repeats"))
      assert(math.abs(ep - tt.toDouble / nt) < 1e-15)
      // n_repeats = ⌈target/n_tokens⌉: bounds the fractional epochs from above
      assert(rep >= ep - 1e-15 && (rep === 0L || ep > rep - 1))
      if (r.getAs[Long]("weight") === 0L) assert(rep === 0L)
    }
  }

  test("d23 containment estimates track d22's exact answer and stay internally consistent") {
    val exact = run("d22_containment").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Double]("containment"))).toMap
    val rows = run("d23_containment_estimate").collect()
    assert(rows.nonEmpty, "planted near-dups must survive the 0.85 screen")
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(a < b, "banded candidates are ordered")
      val m = r.getAs[Long]("est_matches")
      assert(m >= 0 && m <= 30)
      val (sa, sb) = (r.getAs[Long]("size_a"), r.getAs[Long]("size_b"))
      val (ca, cb) = (r.getAs[Double]("est_c_a_in_b"), r.getAs[Double]("est_c_b_in_a"))
      // one shared intersection estimate behind both orientations
      assert(math.abs(ca * sa - cb * sb) < 1e-6 * math.max(sa, sb))
      // where d22 confirmed the containment exactly, the estimate must be
      // within the 30-perm binomial noise (±~3 sd of Ĵ propagated)
      exact.get((a, b)).foreach { c =>
        assert(math.abs(ca - c) < 0.25,
          s"pair ($a,$b): est $ca vs exact $c drifted past sketch noise")
      }
      exact.get((b, a)).foreach { c =>
        assert(math.abs(cb - c) < 0.25,
          s"pair ($b,$a): est $cb vs exact $c drifted past sketch noise")
      }
    }
    // the screen must actually find the exact operator's pairs (recall at
    // the planted J >= 0.9 level, where banding is near-certain)
    val found = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val expectedPairs = exact.keySet.map(p => if (p._1 < p._2) p else p.swap)
    assert(expectedPairs.forall(found.contains),
      "every exact containment pair at the planted level must be screened in")
  }

  test("m10 segments: cuts recompute from m03 energies, segment ids are running counts") {
    val energies = run("m03_audio_features").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val rows = run("m10_scene_segments").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (doc, frames) =>
      val sorted = frames.sortBy(_._2)
      var prevE = -1L
      var segs = 0L
      sorted.foreach { case (_, idx, e, delta, cut, seg) =>
        assert(e === energies((doc, idx)), "energy must match m03's")
        val expDelta = if (prevE < 0) 0L else e - prevE
        assert(delta === expDelta)
        val expCut = prevE >= 0 && math.abs(expDelta) * 10 > prevE
        assert(cut === expCut, s"doc $doc frame $idx: cut flag")
        if (expCut) segs += 1
        assert(seg === segs, s"doc $doc frame $idx: running segment id")
        prevE = e
      }
      assert(!sorted.head._5, "the first frame can never be a cut")
    }
    assert(rows.exists(_._5), "fixture energies should produce at least one cut")
  }

  test("t24 dataset card reconciles with d01 dup flags and t01 token counts") {
    val card = run("t24_dataset_card").collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4),
          r.getAs[Double]("doc_share"), r.getAs[Double]("dup_rate"))))
    assert(card.nonEmpty)
    val d01 = run("d01_exact_dedup").collect()
      .map(r => r.getLong(0) -> r.getAs[Boolean]("is_duplicate")).toMap
    val nTok = run("t01_token_stats").collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_tokens")).toMap
    val meta = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "source", "lang").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2)))
    val total = meta.length.toLong
    assert(card.map(_._2._1).sum === total, "doc counts must cover the corpus")
    assert(math.abs(card.map(_._2._4).sum - 1.0) < 1e-9, "shares sum to 1")
    card.foreach { case ((src, lg), (nd, nt, ndup, share, rate)) =>
      val ids = meta.filter(_._2 == (src, lg)).map(_._1)
      assert(nd === ids.length.toLong)
      assert(nt === ids.map(nTok).sum, s"($src,$lg): token sum")
      assert(ndup === ids.count(d01), s"($src,$lg): dup count vs d01 flags")
      assert(math.abs(share - nd.toDouble / total) < 1e-15)
      assert(math.abs(rate - ndup.toDouble / nd) < 1e-15)
    }
  }

  test("q41 funnel stage matches an independent per-user subsequence recomputation") {
    val events = graft.core.Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map { r =>
        val ts = r.getTimestamp(1)
        // full-precision order key: getTime alone is millis and would
        // mis-order µs-level ties differently than the query's ts sort
        (r.getLong(0), ((ts.getTime / 1000, ts.getNanos), r.getLong(2), r.getString(3)))
      }
      .groupBy(_._1)
    val expected = events.map { case (u, rs) =>
      val seq = rs.map(_._2).sortBy(t => (t._1, t._2)).map(_._3.head)
      // greedy subsequence depth over the funnel order
      val funnel = "svcp"
      var depth = 0
      seq.foreach { c => if (depth < 4 && c == funnel(depth)) depth += 1 }
      u -> depth
    }
    val got = run("q41_funnel_pattern").collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (u, d) =>
      assert(got(u) === d, s"user $u: expected stage $d, got ${got(u)}")
    }
    // at sf0.001 every user has dozens of events of all five types, so
    // all reach stage 4 — stage DIVERSITY is exercised by the synthetic
    // StreamingFunnelSpec fixtures, not this scale; here the value is the
    // per-user recomputation above
    assert(got.nonEmpty && got.values.forall(s => s >= 0 && s <= 4))
  }

  test("s15 filtered kNN: truth is same-label top-3, post_hit equals global-top-20 membership") {
    import org.apache.spark.sql.functions.col
    val vecs = graft.core.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val got = run("s15_filtered_knn").collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), r.getBoolean(3))).toMap
    assert(got.nonEmpty)
    vecs.filter(_._1 % 50 == 0).foreach { case (qid, qlab, qv) =>
      val scored = vecs.filter(_._1 != qid)
        .map { case (id, lab, v) => (id, lab, cos(v, qv)) }
        .sortBy { case (id, _, c) => (-c, id) }
      val top20 = scored.take(20).map(_._1).toSet
      val truth = scored.filter(_._2 == qlab).take(3)
      truth.zipWithIndex.foreach { case ((nid, _, _), i) =>
        val (gNid, gHit) = got((qid, i + 1))
        assert(gNid === nid, s"query $qid rank ${i + 1}: truth neighbor")
        assert(gHit === top20.contains(nid),
          s"query $qid rank ${i + 1}: post_hit flag")
      }
    }
    // the audit is only informative if post-filtering actually misses
    // something somewhere at 1/|labels| selectivity
    assert(got.values.exists(!_._2),
      "expected at least one truth neighbor outside the global top-20")
  }

  test("t26 split audit: content-hash split never leaks, doc_id split leaks planted dup groups") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // ten copies of one content spanning ids 0-9: the doc_id%10 split
    // scatters them over train(0-7)/val(8)/test(9); the content split
    // must co-locate all ten — plus unique filler so every split is
    // non-empty under both strategies
    val dup = (0L until 10L).map(id => (id, "the planted duplicate payload"))
    val uniq = (10L until 110L).map(id => (id, s"unique filler number $id"))
    val dir = tmpDir()
    (dup ++ uniq).toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("t"))
      .withColumn("n_chars", org.apache.spark.sql.functions.length(col("text")).cast("long"))
      .write.parquet(s"$dir/documents.parquet")
    val rows = graft.SparkEntry.queries("t26_hash_split")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val strategies = rows.keySet.map(_._1)
    assert(strategies === Set("content_hash", "doc_id"))
    // both strategies account for all 110 docs
    strategies.foreach { st =>
      val docs = rows.collect { case ((s2, _), (nd, _, _)) if s2 == st => nd }.sum
      assert(docs === 110L, s"$st: doc conservation")
    }
    // content split: zero leaks by construction
    assert(rows.collect { case ((s2, _), (_, _, nl)) if s2 == "content_hash" => nl }.sum === 0L)
    // doc_id split: the dup content appears in all three splits -> it
    // counts as leaked in each split it touches
    val idLeaks = rows.collect { case ((s2, _), (_, _, nl)) if s2 == "doc_id" => nl }.sum
    assert(idLeaks === 3L,
      s"the planted dup group must leak into train+val+test, got $idLeaks")
  }

  test("m12 fingerprint match: a frame-aligned planted containment wins at its offset with full votes") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // doc 2 = 64-cp filler + doc 1's text: frame f of doc 1 equals
    // frame f+2 of doc 2 (hop 32), so every shared landmark agrees on
    // delta = -2; doc 3 is unrelated filler so no cross votes
    val innerLong = (1 to 120).map(i => ('a' + (i * 7) % 26).toChar.toString * 3)
      .mkString(" ") // 479 cps -> 13 frames -> 11 shingles
    val filler64 = "z" * 64
    val other = (1 to 120).map(i => ('A' + (i * 11) % 26).toChar.toString * 3)
      .mkString(" ")
    val dir = tmpDir()
    Seq((1L, innerLong), (2L, filler64 + innerLong), (3L, other))
      .toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("t"))
      .withColumn("n_chars", org.apache.spark.sql.functions.length(col("text")).cast("long"))
      .write.parquet(s"$dir/documents.parquet")
    val out = graft.SparkEntry.queries("m12_audio_fingerprint")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out.contains((1L, 2L)), s"planted containment must match: ${out.keySet}")
    val (delta, votes) = out((1L, 2L))
    assert(delta === -2L, "the alignment offset must localize the 64-cp prefix")
    // doc 1: 479 cps -> 13 frames -> 11 shingles, all shared
    val nCps = innerLong.length
    val nFrames = (nCps - 64) / 32 + 1
    assert(votes === (nFrames - 2).toLong, "every doc-1 shingle votes for the true offset")
    assert(!out.keySet.exists(p => p._1 == 3L || p._2 == 3L),
      "the unrelated doc must not match")
  }

  test("m13 keyframes: argmax-energy per m10 segment, extent conserves the frame count") {
    val segs = run("m10_scene_segments").collect()
      .map(r => (r.getLong(0), r.getLong(5), r.getLong(1), r.getLong(2)))
      .groupBy(t => (t._1, t._2)) // (doc, segment) -> frames
    val keys = run("m13_keyframes").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(keys.keySet === segs.keySet,
      "one keyframe per m10 segment, no segment dropped")
    segs.foreach { case (k, frames) =>
      val (kfIdx, kfEnergy, nFrames, segStart) = keys(k)
      val best = frames.map(t => (t._3, t._4))
        .minBy { case (idx, e) => (-e, idx) }
      assert((kfIdx, kfEnergy) === best, s"segment $k: argmax frame")
      assert(nFrames === frames.length.toLong, s"segment $k: extent count")
      assert(segStart === frames.map(_._3).min, s"segment $k: first frame")
    }
    assert(keys.values.map(_._3).sum === segs.values.map(_.length.toLong).sum,
      "segment extents must tile every frame exactly once")
  }

  test("t27 drift statuses match a driver-side recomputation of both halves") {
    import graft.functions.Portable.h60Scala
    val meta = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "source", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val (batch, stored) = meta.partition { case (id, _, _) =>
      h60Scala(s"drift_$id") % 5 == 4
    }
    val sCnt = stored.groupBy(t => (t._2, t._3)).view.mapValues(_.length.toLong).toMap
    val bCnt = batch.groupBy(t => (t._2, t._3)).view.mapValues(_.length.toLong).toMap
    val nS = stored.length.toLong
    val nB = batch.length.toLong
    val got = run("t27_mixture_drift").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getString(6))).toMap
    assert(got.keySet === (sCnt.keySet ++ bCnt.keySet),
      "one row per grid cell present in either half")
    got.foreach { case (cell, (sd, bd, status)) =>
      assert(sd === sCnt.getOrElse(cell, 0L), s"$cell stored count")
      assert(bd === bCnt.getOrElse(cell, 0L), s"$cell batch count")
      val expected =
        if (sd == 0) "new"
        else if (bd == 0) "vanished"
        else if (bd * nS > sd * nB * 2) "over"
        else if (bd * nS * 2 < sd * nB) "under"
        else "stable"
      assert(status === expected, s"$cell status (sd=$sd bd=$bd)")
    }
    // the monitor is only useful if the hash split decorrelates from
    // the generator's source = f(doc_id % 20): some cell must be
    // genuinely comparable (both halves non-empty)
    assert(got.values.exists(v => v._1 > 0 && v._2 > 0),
      "the drift split must not reproduce the modular-source pathology")
  }

  test("d26 histogram reconciles with d09 components and tiles the corpus exactly") {
    val hist = run("d26_cluster_histogram").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getAs[Double]("doc_share"))).toMap
    val d09 = run("d09_dedup_components").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val total = graft.core.Tables.documents(spark, sf).count()
    // multi-doc buckets match d09's clusters exactly
    val byCluster = d09.groupBy(_._2).map { case (_, rows) =>
      val s2 = rows.head._3
      assert(rows.length.toLong === s2, "d09 size column self-consistent")
      s2
    }.toSeq
    byCluster.groupBy(identity).foreach { case (size, cs) =>
      assert(hist(size)._1 === cs.length.toLong,
        s"size-$size cluster count vs d09")
    }
    // singletons = everything d09 didn't label
    assert(hist(1L)._1 === total - d09.length.toLong,
      "singleton bucket covers the non-duplicated majority")
    assert(hist.values.map(_._2).sum === total,
      "bucket doc counts must tile the corpus exactly")
    assert(math.abs(hist.values.map(_._3).sum - 1.0) < 1e-9,
      "doc shares sum to 1")
  }

  test("q44 anomaly flags: planted spike flags, uniform type stays quiet, flags match exact rationals") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    // planted corpus: type 'steady' has 10 identical days (variance 0 —
    // no day may flag); type 'spiky' has 17 days of 10 events and one
    // of 100. The day count matters: a SINGLE outlier's population z
    // is bounded by sqrt(n-1), so with 10 days a lone spike tops out
    // at exactly 3 sigma and can never flag — 18 days lift the bound
    // to ~4.1 and this spike lands at z ≈ 3.6
    val base = java.sql.Timestamp.valueOf("2026-04-01 00:00:00").getTime
    val day = 24L * 3600 * 1000
    def mk(ty: String, d2: Int, k: Int, id0: Long) = (0 until k).map(i =>
      (id0 + d2 * 1000L + i, new java.sql.Timestamp(base + d2 * day + i * 1000L),
        1L, ty, 1.0, "{}"))
    val rows = (0 until 10).flatMap(d2 => mk("steady", d2, 5, 0L)) ++
      (0 until 17).flatMap(d2 => mk("spiky", d2, 10, 100000L)) ++
      mk("spiky", 17, 100, 100000L)
    val dir = tmpDir()
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = graft.SparkEntry.queries("q44_volume_anomaly")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString) ->
        (r.getLong(2), r.getBoolean(4))).toMap
    assert(got.size === 28)
    got.foreach { case ((ty, dy), (n, flag)) =>
      val expect = ty == "spiky" && n == 100L
      assert(flag === expect, s"($ty, $dy, n=$n)")
    }
    // real data: flags equal an exact-rational recomputation
    val daily = graft.core.Tables.events(spark, sf)
      .groupBy(col("event_type"),
        org.apache.spark.sql.functions.date_trunc("day", col("ts")).as("day"))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString, r.getLong(2)))
    val byType = daily.groupBy(_._1)
    val expected = daily.map { case (ty, dy, x) =>
      val xs = byType(ty).map(_._3)
      val n = xs.length.toLong
      val s2 = xs.sum
      val ss = xs.map(v => BigInt(v) * v).sum
      val lhs = (BigInt(n) * x - s2).pow(2)
      val rhs = 9 * (BigInt(n) * ss - BigInt(s2) * s2)
      (ty, dy) -> (lhs > rhs)
    }.toMap
    val real = graft.SparkEntry.queries("q44_volume_anomaly")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString) -> r.getBoolean(4)).toMap
    assert(real === expected, "flags must equal the BigInt rational recomputation")
  }

  test("s17 recall curve is monotone in K and its K=20 point equals s15's post_hit count") {
    val curve = run("s17_filter_recall_curve").collect()
      .map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(curve.keySet === Set(5, 10, 20, 50))
    val (nq, tr, _) = curve(5)
    curve.values.foreach { case (q2, t2, h) =>
      assert((q2, t2) === ((nq, tr)), "shared truth denominators")
      assert(h >= 0 && h <= t2)
    }
    // a bigger pool can only add hits
    assert(curve(5)._3 <= curve(10)._3 && curve(10)._3 <= curve(20)._3 &&
      curve(20)._3 <= curve(50)._3, "recall must be monotone in K")
    // cross-query consistency: s15's per-row post_hit flags ARE the
    // K=20 point of this curve
    val s15Hits = run("s15_filtered_knn").collect()
      .count(_.getBoolean(3)).toLong
    assert(curve(20)._3 === s15Hits,
      "curve(K=20) must equal the sum of s15 post_hit flags")
    assert(tr === run("s15_filtered_knn").count(),
      "truth_rows must equal s15's output rows")
  }

  test("s22 range audit: n_true matches a driver-side exact recount, screen counts are consistent") {
    val rows = run("s22_range_search").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    assert(rows.nonEmpty)
    rows.foreach { case (qid, nt, nf, nm, pct) =>
      assert(nf >= 0L && nf <= nt, s"query $qid: found must screen the true set")
      assert(nm === nt - nf)
      pct match {
        case Some(p) => assert(nt > 0L && p === nf * 100L / nt)
        case None    => assert(nt === 0L, "pct only null on an empty range set")
      }
    }
    // independent exact recount of each query's range set (driver-side
    // doubles; the ±1e-9 band makes the assert ulp-proof at τ — random
    // fixture cosines never land within it)
    val vecs = graft.core.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
    val nrm = vecs.view.mapValues(v => math.sqrt(dot(v, v))).toMap
    rows.foreach { case (qid, nt, _, _, _) =>
      val qv = vecs(qid)
      val cos = vecs.collect { case (id, v) if id != qid =>
        dot(v, qv) / (nrm(id) * nrm(qid))
      }
      assert(nt <= cos.count(_ >= 0.3 - 1e-9) &&
        nt >= cos.count(_ > 0.3 + 1e-9),
        s"query $qid: engine n_true $nt outside the exact recount band")
    }
  }

  test("q45 estimators: exact below k (sf0.001), within KMV error above k (sf0.01)") {
    import org.apache.spark.sql.functions._
    def truth(d: String): Map[(String, String), (Long, Long, Long, Long)] = {
      val ev = graft.core.Tables.events(spark, d)
        .select(col("event_type"), col("user_id")).distinct()
      val types = ev.select("event_type").distinct()
        .collect().map(_.getString(0)).sorted
      val byType = types.map(t => t -> ev.filter(col("event_type") === t)
        .select("user_id").collect().map(_.getLong(0)).toSet).toMap
      (for { a <- types; b <- types if a < b } yield {
        val (sa, sb) = (byType(a), byType(b))
        (a, b) -> (sa.size.toLong, sb.size.toLong,
          (sa | sb).size.toLong, (sa & sb).size.toLong)
      }).toMap
    }
    // sub-k regime: 15 distinct users/type < 64 — every sketch IS the
    // exact distinct set and all four estimators must be integer-exact
    run("q45_kmv_distinct_algebra").collect().foreach { r =>
      val (na, nb, nu, ni) = truth(sf)((r.getString(0), r.getString(1)))
      assert(r.getDouble(2) === na.toDouble && r.getDouble(3) === nb.toDouble)
      assert(r.getDouble(4) === nu.toDouble)
      assert(r.getDouble(5) === ni.toDouble,
        s"sub-k intersection must be exact: ${r.getDouble(5)} vs $ni")
    }
    // sketch regime: 150 distinct/type > 64 — KMV standard error is
    // ~1/sqrt(k-1) ≈ 12.6%; accept 3 sigma. Intersection inherits the
    // union estimate's error times the ratio-estimator noise, so give
    // it the same relative band around the true value plus a small
    // absolute floor for near-empty intersections.
    val big = truth("/root/testdata/sf0.01")
    graft.SparkEntry.queries("q45_kmv_distinct_algebra")(
        spark, "/root/testdata/sf0.01").collect().foreach { r =>
      val (na, nb, nu, ni) = big((r.getString(0), r.getString(1)))
      def within(est: Double, exact: Long, tol: Double, floor: Double = 0.0): Unit =
        assert(math.abs(est - exact) <= math.max(tol * exact, floor),
          s"${r.getString(0)}x${r.getString(1)}: est $est vs exact $exact")
      within(r.getDouble(2), na, 0.38)
      within(r.getDouble(3), nb, 0.38)
      within(r.getDouble(4), nu, 0.38)
      within(r.getDouble(5), ni, 0.45, floor = 15.0)
    }
  }
}
