package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.{Q, Tables}
import graft.functions.Kernels
import graft.functions.Portable._

/** Deduplication operators for a training-data pipeline over `documents`:
  * exact (hash groupBy), word-n-gram Jaccard (all candidate pairs via a
  * shingle-inverted-index join), MinHash + banded LSH (the 100 TB path),
  * prefix-filtered and frequency-capped exact joins, SimHash sketches +
  * the Manku-banded Hamming pair join, positional span dedup (plain and
  * capped), connected-component canonicalization, embedding near-dup,
  * eval-set decontamination (parameterized over any external eval
  * table), Broder signature-agreement Jaccard estimation (d14; its
  * semantic sibling d13 SemDeDup lives in Similarity with the vector
  * machinery), incremental dedup of a new batch against the warehouse's
  * persisted signature and content-hash stores (d15/d16, with streaming
  * producers in graft.streaming.DocumentStreams), the
  * duplicated-span CUT rewrite (d17) that removes what d08 detects,
  * the bloom-filter membership prefilter over the hash store (d18),
  * and quality-argmax cluster canonicalization (d19 — keep each
  * duplicate cluster's best document, not its min id).
  *
  * Scale design per operator is documented inline; the common principles:
  *  - candidate generation is always a join on a *derived small key*
  *    (content hash, shingle, band bucket), never a cross join;
  *  - per-doc sketches (minhash signatures, simhash) are computed with
  *    map-side expressions and aggregated once, so each doc's text is
  *    scanned exactly once;
  *  - verification joins carry pre-computed shingle sets, and the candidate
  *    side is broadcast (it is ~|near-dup pairs|, orders of magnitude
  *    smaller than the corpus).
  *
  * All hashing is md5-derived (Portable.h60) so the DuckDB oracle verifies
  * results exactly — including the MinHash signatures themselves.
  */
object Dedup {

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)

  private val sqlShingled =
    """WITH n AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm FROM documents),
      |tk AS (SELECT doc_id, list_filter(string_split(norm, ' '), t -> t <> '') AS toks FROM n),
      |sg AS (SELECT doc_id,
      |  CASE WHEN len(toks) >= 3 THEN
      |    list_distinct(list_transform(range(1, len(toks) - 1),
      |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
      |  ELSE [] END AS sh FROM tk),
      |sh AS (SELECT doc_id, sh, len(sh) AS nsh FROM sg WHERE len(sh) > 0)""".stripMargin

  /** Oracle twin of the corpus component structure ([[connectedComponents]]
    * over the ≥ 0.5 Jaccard pair graph): the recursive-CTE chain
    * shingles→pairs→edges→reach, where `reach` maps every component
    * node to its reachable set. ONE definition shared by the d09, d19
    * and d26 oracles — the pair threshold, shingle normalization and
    * direction union live here exactly once, so the label-store
    * producer's gate and its consumers' gates can never drift apart.
    */
  private lazy val sqlComponents =
    s"""${sqlShingled.replaceFirst("WITH ", "WITH RECURSIVE ")},
       |ex AS (SELECT doc_id, nsh, unnest(sh) AS shingle FROM sh),
       |p0 AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    a.nsh AS size_a, b.nsh AS size_b, count(*)::BIGINT AS intersection
       |  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2, 3, 4),
       |pr AS (SELECT doc_a, doc_b FROM p0
       |  WHERE intersection * 1.0 / (size_a + size_b - intersection) >= 0.5),
       |edges AS (SELECT doc_a, doc_b FROM pr UNION SELECT doc_b, doc_a FROM pr),
       |reach AS (
       |  SELECT doc_a AS node, doc_b AS r FROM edges
       |  UNION
       |  SELECT reach.node, edges.doc_b AS r FROM reach JOIN edges ON reach.r = edges.doc_a)""".stripMargin

  /** Per-document 60-bit SimHash SQL (CTE `sk`) — the oracle twin of
    * [[Kernels.simhash60]], shared by d04 (the sketches themselves) and
    * d11 (the exact all-pairs Hamming answer the banded join must equal).
    */
  private val sqlSimhashed =
    """WITH n AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm FROM documents),
      |tk AS (SELECT doc_id, list_filter(string_split(norm, ' '), t -> t <> '') AS toks FROM n),
      |tf AS (SELECT doc_id, list_transform(list_distinct(toks),
      |  x -> {'cnt': len(list_filter(toks, t -> t = x)),
      |        'h': ('0x' || substr(md5(x), 1, 15))::BIGINT}) AS tf FROM tk),
      |sk AS (SELECT doc_id,
      |  list_reduce(list_transform(range(0, 60), b ->
      |    CASE WHEN list_reduce(list_transform(tf,
      |        p -> p.cnt * (((p.h >> b) & 1) * 2 - 1)), (x, y) -> x + y) > 0
      |      THEN (1::BIGINT << b) ELSE 0::BIGINT END), (x, y) -> x + y) AS simhash
      |FROM tf)""".stripMargin

  /** Exact all-pairs trigram-Jaccard SQL (the oracle for d02 and d03):
    * inverted-index join on the shingle, then jaccard from intersection
    * counts.
    */
  private def sqlExactJaccard(threshold: Double): String =
    s"""$sqlShingled,
       |ex AS (SELECT doc_id, nsh, unnest(sh) AS shingle FROM sh),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    a.nsh AS size_a, b.nsh AS size_b, count(*)::BIGINT AS intersection
       |  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2, 3, 4)
       |SELECT doc_a, doc_b, size_a::BIGINT AS size_a, size_b::BIGINT AS size_b,
       |  intersection,
       |  intersection * 1.0 / (size_a + size_b - intersection) AS jaccard
       |FROM pairs
       |WHERE intersection * 1.0 / (size_a + size_b - intersection) >= $threshold
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Positional window frame (doc_id, pos, span_hash): the 60-bit hash of
    * every `w`-token window at every token position — NOT distinct, unlike
    * [[explodedShingles]], because span dedup needs to know WHERE the
    * duplicate text sits. Same typed-kernel rationale as the shingle
    * kernel (one O(|text|) pass per document, no Generate re-evaluation).
    */
  private[graft] def positionalWindows(s: SparkSession, d: String,
      w: Int): DataFrame = positionalWindowsOf(docs(s, d), w)

  /** [[positionalWindows]] over an arbitrary (doc_id, text) frame — the
    * form [[decontaminate]] needs to window an EXTERNAL eval table.
    */
  private[graft] def positionalWindowsOf(docFrame: DataFrame,
      w: Int): DataFrame = {
    import docFrame.sparkSession.implicits._
    docFrame.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val toks = Kernels.lowerTokens(text)
          (0 to toks.length - w).iterator.map { i =>
            (id, i.toLong, h60Scala(toks.slice(i, i + w).mkString(" ")))
          }
        }
      }
      .toDF("doc_id", "pos", "span_hash")
  }

  /** Token-suffix frame (doc_id, pos, anchor, key) — one row per token
    * position with at least `minLen` tokens remaining (shorter suffixes
    * cannot host a >= minLen duplicated span). `key` is the suffix's
    * first `cap` tokens — the sort key of the distributed suffix array —
    * and `anchor` is the h60 of its first `anchorLen` tokens, the
    * window's shard key: two suffixes agreeing on >= anchorLen tokens
    * share the anchor by construction, so sorting WITHIN anchor groups
    * loses no neighbor whose LCP could reach minLen (cross-anchor pairs
    * have LCP < anchorLen < minLen). One typed-kernel pass, same
    * rationale as [[positionalWindowsOf]].
    */
  private[graft] def suffixFrame(docFrame: DataFrame, minLen: Int,
      cap: Int, anchorLen: Int): DataFrame = {
    import docFrame.sparkSession.implicits._
    docFrame.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val toks = Kernels.lowerTokens(text)
          (0 to toks.length - minLen).iterator.map { p =>
            (id, p.toLong,
              h60Scala(toks.slice(p, p + anchorLen).mkString(" ")),
              toks.slice(p, math.min(toks.length, p + cap)).toSeq)
          }
        }
      }
      .toDF("doc_id", "pos", "anchor", "key")
  }

  /** Token-LCP of two capped suffix keys (0 when the neighbor is absent):
    * position of the first per-element mismatch, or min length when one
    * key prefixes the other. Catalyst higher-order functions only — the
    * DuckDB twin is the same list_transform/list_position expression.
    */
  private def lcpCol(a: Column, b: Column): Column = {
    val firstFalse =
      array_position(zip_with(a, b, (x, y) => x.eqNullSafe(y)), lit(false))
    when(b.isNull, lit(0L)).otherwise(
      when(firstFalse === 0, least(size(a), size(b)).cast("long"))
        .otherwise(firstFalse - 1))
  }

  /** Maximal duplicated substrings (the Lee et al. 2022 ExactSubstr
    * operator at token granularity, suffix-array-shaped for Spark):
    * for every token position, `dup_len` = the longest match (capped at
    * `cap` tokens) between the suffix starting there and ANY other
    * suffix in the corpus — other documents or elsewhere in the same
    * one, the paper's definition of duplicated text. Exactness without
    * all-pairs: in lexicographic suffix order the max LCP of a suffix
    * is attained at an ADJACENT suffix, so one sort + lag/lead
    * neighbor-compare computes every dup_len; sharding that sort by the
    * `anchorLen`-token anchor keeps it distributed (each window group
    * is one anchor's suffixes, df-bounded like d07's shingle groups)
    * while losing only pairs with LCP < anchorLen — invisible below the
    * minLen threshold. The per-doc second window then keeps LEFT-MAXIMAL
    * spans: a position whose predecessor's span already covers it
    * (prev dup_len >= dup_len + 1) is a sub-span, not a finding.
    * Result: (doc_id, pos, len) per maximal duplicated span, len in
    * [minLen, cap].
    *
    * 100 TB: the suffix frame is |tokens| rows carrying <= cap tokens
    * each — a ~cap× amplification of the corpus through ONE exchange;
    * that is the method's published cost (suffix-array dedup ships the
    * corpus into sorted order). The anchor both shards the sort and
    * bounds each window group at the anchor's df; hot boilerplate
    * anchors cap out exactly like d10's hot spans. The second window
    * ships only (doc_id, pos, dup_len) — 24 bytes/row. d08's fixed
    * windows remain the cheap screen; this is the exact-length answer.
    */
  def maximalDupSpans(docFrame: DataFrame, minLen: Int = 12,
      cap: Int = 64, anchorLen: Int = 4): DataFrame = {
    val suff = suffixFrame(docFrame, minLen, cap, anchorLen)
    val ws = Window.partitionBy("anchor").orderBy("key")
    // pk/nk materialize ONCE each: inlining the lag/lead into lcpCol's
    // four references would make the Window operator compute four
    // copies of each neighbor array per row
    val neigh = suff
      .withColumn("pk", lag(col("key"), 1).over(ws))
      .withColumn("nk", lead(col("key"), 1).over(ws))
      .withColumn("dup_len", greatest(
        lcpCol(col("key"), col("pk")), lcpCol(col("key"), col("nk"))))
      .select(col("doc_id"), col("pos"), col("dup_len"))
    val wd = Window.partitionBy("doc_id").orderBy("pos")
    neigh
      .withColumn("prev_len", lag(col("dup_len"), 1).over(wd))
      .filter(col("dup_len") >= minLen &&
        (col("prev_len").isNull || col("prev_len") < col("dup_len") + 1))
      .select(col("doc_id"), col("pos"), col("dup_len").as("len"))
      .orderBy("doc_id", "pos")
  }

  /** CROSS-corpus maximal contaminated substrings — [[maximalDupSpans]]'s
    * bipartite form, the span-grain upgrade of [[decontaminate]]: for
    * every train-doc token position, `dup_len` = the longest match
    * (capped) between the suffix starting there and ANY EVAL suffix —
    * substring-level benchmark decontamination (the ExactSubstr operator
    * of Lee et al. 2022 §4 run train-against-eval), reporting positions
    * and exact lengths so spans can be CUT (d17's rewrite) instead of
    * dropping whole documents the way d12's window-membership rule does.
    *
    * Exactness without all-pairs, one step past d27's lag/lead: in the
    * UNION'd lexicographic suffix order, the max LCP of a train suffix
    * against the eval side is attained at the NEAREST eval suffix on one
    * of the two sides (LCP is non-increasing with sorted distance), so
    * two running `last(…, ignoreNulls)` windows — one ascending, one
    * descending — carry each train row its nearest eval key; both are
    * incremental frames (never an unbounded-FOLLOWING frame, whose
    * Spark evaluator re-scans per row, O(group²)). Ties between equal
    * train/eval keys are broken deterministically side-last ascending /
    * side-first descending, so an eval suffix EQUAL to a train suffix is
    * always visible to exactly the descending window — both engines
    * agree by construction, and dup_len values stay engine-sort-
    * independent as in d27. Anchor sharding, minLen visibility bound and
    * the left-maximality filter are d27's.
    *
    * 100 TB: eval sets are tiny, but unlike d12's hash-set broadcast the
    * exact-length answer needs eval suffixes IN sort position, so the
    * corpus pays d27's one anchor-sharded exchange (+ a second in-place
    * sort for the descending pass) with the eval rows riding along —
    * |eval| ≪ |train| adds nothing material to the shuffle. Output is
    * (train doc, pos, len) at hit grain — rare by construction.
    */
  def crossDupSpans(train: DataFrame, evalDocs: DataFrame, minLen: Int = 12,
      cap: Int = 64, anchorLen: Int = 4): DataFrame = {
    val suff = suffixFrame(train, minLen, cap, anchorLen)
      .withColumn("side", lit(0))
      .unionByName(suffixFrame(evalDocs, minLen, cap, anchorLen)
        .withColumn("side", lit(1)))
    val evalKey = when(col("side") === 1, col("key"))
    val asc = Window.partitionBy("anchor")
      .orderBy(col("key").asc, col("side").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val desc = Window.partitionBy("anchor")
      .orderBy(col("key").desc, col("side").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val neigh = suff
      .withColumn("pe", last(evalKey, ignoreNulls = true).over(asc))
      .withColumn("ne", last(evalKey, ignoreNulls = true).over(desc))
      .filter(col("side") === 0)
      .withColumn("dup_len", greatest(
        lcpCol(col("key"), col("pe")), lcpCol(col("key"), col("ne"))))
      .select(col("doc_id"), col("pos"), col("dup_len"))
    val wd = Window.partitionBy("doc_id").orderBy("pos")
    neigh
      .withColumn("prev_len", lag(col("dup_len"), 1).over(wd))
      .filter(col("dup_len") >= minLen &&
        (col("prev_len").isNull || col("prev_len") < col("dup_len") + 1))
      .select(col("doc_id"), col("pos"), col("dup_len").as("len"))
      .orderBy("doc_id", "pos")
  }

  /** Flat exploded shingle frame (doc_id, nsh, shingle-hash) — the shared
    * input of the pair joins (kernels: [[Kernels.lowerTokens]] +
    * [[Kernels.shingles]]). Flat long rows materialize cheaply (unlike the
    * array form, whose columnar serialization cost exceeded its recompute
    * savings ~10×); callers whose branches lack a common exchange
    * materialize it with an EAGER localCheckpoint rather than cache() —
    * RDD-level blocks the ContextCleaner reclaims when the query's
    * references drop, with nothing registered in the session
    * CacheManager, so no storage outlives the query and embedding
    * applications never need a clearCache contract.
    */
  private[graft] def explodedShingles(s: SparkSession, d: String): DataFrame =
    explodedShinglesOf(docs(s, d))

  /** [[explodedShingles]] over an arbitrary (doc_id, text) frame — the
    * form d15 needs to shingle ONLY the new batch, never the corpus the
    * signature store already covers.
    */
  private[graft] def explodedShinglesOf(docFrame: DataFrame): DataFrame = {
    import docFrame.sparkSession.implicits._
    docFrame.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val sh = Kernels.shingles(Kernels.lowerTokens(text))
          sh.map(h => (id, sh.length, h))
        }
      }
      .toDF("doc_id", "nsh", "shingle")
  }

  /** 30-permutation MinHash signature per document (columns doc_id,
    * mh_0..mh_29) from the exploded-shingle frame — shared by d03 (LSH
    * candidates, exact verify), d14 (signature-agreement estimates),
    * d15 (the store build) and the streaming store ingest
    * (DocumentStreams.signatureIngest), so a permutation-family change
    * can never diverge any of them.
    */
  private[graft] def minhashSigs(ex: DataFrame): DataFrame = {
    val g = ex.withColumn("g", col("shingle") % MinHashP)
    val mhCols = (0 until 30).map(k => min(perm(k, col("g"))).as(s"mh_$k"))
    g.groupBy("doc_id").agg(mhCols.head, mhCols.tail: _*)
  }

  /** [[minhashSigs]] plus the exact distinct-shingle count (`nsh`) in
    * the SAME aggregation pass — the signature-sidecar schema once the
    * containment family consumes it too: d15 reads the signature
    * columns, d25 additionally reads `nsh` (one long/doc, the price of
    * turning the symmetric-J sidecar into a containment-capable one —
    * Broder's Ĵ + exact sizes recover both orientations' ĉ, the d23
    * algebra, without ever re-touching shingles). `nsh` is constant per
    * doc in the exploded frame, so max() is exact and folds map-side
    * with the mins.
    */
  private[graft] def minhashSigsSized(ex: DataFrame): DataFrame = {
    val g = ex.withColumn("g", col("shingle") % MinHashP)
    val aggs = (0 until 30).map(k => min(perm(k, col("g"))).as(s"mh_$k")) :+
      max(col("nsh")).as("nsh")
    g.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** Per-SOURCE union-MinHash signatures (source, mh_0..mh_29) from any
    * (source, text) frame: the min of each permutation over the UNION
    * of a source's shingle sets folds from plain min-aggregation over
    * its documents' shingles (Broder). Same permutation family as
    * [[minhashSigs]]. Shared by d21 (the batch overlap map), the
    * streaming store producer
    * ([[graft.streaming.DocumentStreams.sourceSigIngest]]) and the
    * read-time merge ([[mergeSourceSigs]]) — min-folding is associative,
    * commutative and IDEMPOTENT, so batch-partitioned signatures merge
    * losslessly in any grouping and a redelivered batch changes nothing.
    */
  private[graft] def sourceSignatures(docFrame: DataFrame): DataFrame = {
    import docFrame.sparkSession.implicits._
    val ex = docFrame.select(col("source"), col("text"))
      .as[(String, String)]
      .mapPartitions(_.flatMap { case (src, tx) =>
        Kernels.shingles(Kernels.lowerTokens(tx)).iterator
          .map(h => (src, h))
      })
      .toDF("source", "shingle")
    val g = ex.withColumn("g", col("shingle") % MinHashP)
    val mhCols = (0 until 30).map(k => min(perm(k, col("g"))).as(s"mh_$k"))
    g.groupBy("source").agg(mhCols.head, mhCols.tail: _*)
  }

  /** Read-time min-merge of a batch-partitioned source-signature store
    * (one subdir per producer micro-batch): a source written by many
    * batches holds one row per batch; the element-wise min recovers
    * exactly the whole-corpus signature ([[sourceSignatures]]'s
    * idempotence note).
    */
  private[graft] def mergeSourceSigs(raw: DataFrame): DataFrame = {
    val mhCols = (0 until 30).map(k => min(col(s"mh_$k")).as(s"mh_$k"))
    raw.groupBy("source").agg(mhCols.head, mhCols.tail: _*)
  }

  /** The |sources|² overlap map over a signature frame — d21's pair
    * join, parameterized over the signature producer (inline batch
    * derivation, or the merged streaming store).
    */
  private[graft] def sourceOverlapOf(sigs: DataFrame): DataFrame = {
    val b = sigs.toDF(sigs.columns.map(c =>
      if (c == "source") "source_b" else s"${c}_b"): _*)
    val matches = (0 until 30).map(k =>
      when(col(s"mh_$k") === col(s"mh_${k}_b"), 1L).otherwise(0L))
      .reduce(_ + _)
    sigs.join(broadcast(b), col("source") < col("source_b"))
      .withColumn("est_matches", matches)
      .select(col("source").as("source_a"), col("source_b"),
        col("est_matches"),
        (col("est_matches") * lit(1.0) / 30).as("est_jaccard"))
      .orderBy("source_a", "source_b")
  }

  /** Per-document 60-bit SimHash sketches (doc_id, simhash) — ONE
    * derivation shared by d04 (the sketch query) and d11 (the Hamming
    * pair join that consumes them), so the two can never silently
    * diverge on the sketch arithmetic.
    */
  private def simhashFrame(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    docs(s, d).select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, tx) =>
        (id, Kernels.simhash60(Kernels.lowerTokens(tx)))
      })
      .toDF("doc_id", "simhash")
  }

  /** One row per (doc, band): the folded bucket key plus the band's 3
    * signature components. The bucket key is engine-internal (never
    * oracle-compared), so it can be one xxhash64 long instead of a
    * concat string — the bucket join then shuffles/compares 8-byte
    * keys, not ~60-byte strings — with the band id folded INTO the
    * hash, collapsing the (band, bkey) composite key to a single long.
    * The 3 raw components ride along so consumers re-check their
    * equality AFTER the bucket match: a candidate pair is then DEFINED
    * by true band-triple agreement — the ~2^-64 xxhash64 collision on
    * non-agreeing triples can never create a Spark-only candidate the
    * d14 oracle (which tests real agreement) or the streaming twin's
    * minAgreeingBand would lack.
    */
  private def bandRows(sigs: DataFrame): DataFrame =
    sigs.select(col("doc_id"), explode(array(
      (0 until 10).map { j =>
        val (a, b, c) = (col(s"mh_${3 * j}"), col(s"mh_${3 * j + 1}"),
          col(s"mh_${3 * j + 2}"))
        struct(xxhash64(lit(j), a, b, c).as("bkey"),
          a.as("m0"), b.as("m1"), c.as("m2"))
      }: _*)).as("b"))
      .select(col("doc_id"), col("b.bkey").as("bkey"),
        col("b.m0").as("m0"), col("b.m1").as("m1"), col("b.m2").as("m2"))

  /** Banded LSH candidate pairs (doc_a < doc_b, distinct) from MinHash
    * signatures: 10 bands × 3 rows ([[bandRows]]), self-joined on the
    * bucket key with the post-join triple-agreement re-check.
    */
  private def bandedCandidates(sigs: DataFrame): DataFrame = {
    val bands = bandRows(sigs)
    // merge-hinted: a corpus band frame never broadcasts (jaccardPairs)
    bands.as("x").hint("merge")
      .join(bands.as("y"), Seq("bkey"))
      .filter(col("x.doc_id") < col("y.doc_id") &&
        col("x.m0") === col("y.m0") && col("x.m1") === col("y.m1") &&
        col("x.m2") === col("y.m2"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
  }

  /** [[bandRows]]/[[bandedCandidates]] generalized to any (bands, rows)
    * geometry over the 30-perm signature — d29's knob. Band j hashes
    * rows [r·j, r·j+r); the array equality after the bucket join is the
    * same collision re-check the fixed 10×3 path does column-wise.
    */
  private def bandedCandidatesG(sigs: DataFrame, nb: Int, r: Int): DataFrame = {
    val bands = sigs.select(col("doc_id"), explode(array(
      (0 until nb).map { j =>
        val ms = (0 until r).map(i => col(s"mh_${r * j + i}"))
        struct(xxhash64((lit(j) +: ms): _*).as("bkey"),
          array(ms: _*).as("mrows"))
      }: _*)).as("b"))
      .select(col("doc_id"), col("b.bkey").as("bkey"),
        col("b.mrows").as("mrows"))
    bands.as("x").hint("merge")
      .join(bands.as("y"), Seq("bkey"))
      .filter(col("x.doc_id") < col("y.doc_id") &&
        col("x.mrows") === col("y.mrows"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
  }

  /** Broder signature-agreement estimation of a candidate pair set:
    * attach both docs' 30-long signatures, count agreeing components,
    * keep pairs at estimate >= 0.5 — O(30) per pair, the shingle sets are
    * never re-touched. Shared by d14 (one-frame batch) and d15 (new batch
    * vs the persisted store).
    *
    * The attach shape depends on WHOSE candidates these are:
    *  - d14 (`broadcastCand = false`): the candidate set spans the whole
    *    corpus — output-bound but corpus-proportional, so it must never
    *    broadcast; merge-hinted SMJs shuffle the pair set AND the
    *    signature side (broadcasting the signature side is never right
    *    either, and a small parquet's size estimate would statically
    *    pick exactly that).
    *  - d15 (`broadcastCand = true`): candidates all touch one daily
    *    batch — batch-bound — so they BROADCAST and the warehouse
    *    signature store STREAMS through both attaches with zero
    *    exchanges. This is the difference between shuffling the whole
    *    240 B/doc sidecar (TBs at a 10^9-doc corpus) per daily batch
    *    and reading it exactly once, exchange-free (plan-asserted).
    */
  /** The filterless attach + match count behind [[signatureEstimates]]
    * and d23 (which must keep sub-0.5 estimates for its containment
    * algebra): one place owns the mh_0..mh_29 column contract, so a
    * permutation-family or signature-width change can't diverge the
    * consumers.
    */
  private def signatureAttach(cand: DataFrame, sigs: DataFrame,
      broadcastCand: Boolean = false): DataFrame = {
    val aSide = sigs.select(col("doc_id").as("doc_a") +:
      (0 until 30).map(k => col(s"mh_$k").as(s"a_$k")): _*)
    val bSide = sigs.select(col("doc_id").as("doc_b") +:
      (0 until 30).map(k => col(s"mh_$k").as(s"b_$k")): _*)
    val matches = (0 until 30).map(k =>
      when(col(s"a_$k") === col(s"b_$k"), 1L).otherwise(0L)).reduce(_ + _)
    val attached =
      if (broadcastCand) {
        // first attach: candidates broadcast, the store STREAMS. Its
        // result is pair-bound (|cand| rows), so it eagerly
        // materializes (localCheckpoint) and broadcasts for the second
        // attach — the broadcast build is then a measured-size RDD of
        // batch data, never a subtree containing a store scan, and the
        // store is read exactly twice, exchange-free both times.
        val firstAttach = broadcast(cand).join(aSide, "doc_a")
          .localCheckpoint(true)
        broadcast(firstAttach).join(bSide, "doc_b")
      } else
        cand.join(aSide.hint("merge"), "doc_a")
          .join(bSide.hint("merge"), "doc_b")
    attached.withColumn("est_matches", matches)
  }

  private def signatureEstimates(cand: DataFrame, sigs: DataFrame,
      broadcastCand: Boolean = false): DataFrame =
    signatureAttach(cand, sigs, broadcastCand)
      .filter(col("est_matches") >= 15)
      .select(col("doc_a"), col("doc_b"), col("est_matches"),
        (col("est_matches") * lit(1.0) / 30).as("est_jaccard"))

  /** Spark side of the exact pair computation (d02, and the verification
    * stage of d03/d06): inverted-index equi-join on the 60-bit shingle
    * hash (long keys join ~3× faster than strings; 2^-60 collisions are
    * below the float-formatting noise floor). Only docs sharing a shingle
    * meet, so the pair space is output-bound, not |docs|². At 100 TB the
    * few ultra-hot shingles dominate the shuffle — AQE skew-join splits
    * them; a frequency-capped variant (drop shingles in >1% of docs) is
    * the standard recall-preserving mitigation for J >= 0.5 thresholds.
    */
  private[graft] def jaccardPairs(ex: DataFrame, threshold: Double): DataFrame = {
    // Self-join shape, chosen deliberately (SkewSpec pins it):
    //  - merge hint, NOT broadcast: a corpus self-join side is never
    //    broadcastable at scale, but Catalyst ESTIMATES the exploded
    //    kernel output from the parquet input size, so at small-file
    //    scale it would statically build a multi-million-row hash
    //    relation AND run the shingle kernel once per side (measured 2×
    //    the SMJ time at sf0.1; an OOM at 100 TB);
    //  - no explicit repartition: the two sides are the same frame, so
    //    the ENSURE_REQUIREMENTS exchanges are canonically identical and
    //    ReuseExchange computes the shuffle ONCE anyway — while an
    //    explicit repartition(col)'s REPARTITION_BY_COL origin makes
    //    AQE's OptimizeSkewedJoin refuse to split a hot shingle
    //    (overriding a user-requested distribution), silently trading
    //    away the skew protection this join needs most.
    val a = ex.select(col("doc_id").as("doc_a"), col("nsh").as("size_a"), col("shingle"))
    val b = ex.select(col("doc_id").as("doc_b"), col("nsh").as("size_b"), col("shingle"))
    a.hint("merge").join(b, Seq("shingle"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b", "size_a", "size_b")
      .agg(count(lit(1)).as("intersection"))
      .withColumn("jaccard",
        col("intersection") * lit(1.0) /
          (col("size_a") + col("size_b") - col("intersection")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"),
        col("size_a").cast("long"), col("size_b").cast("long"),
        col("intersection"), col("jaccard"))
  }

  /** Exact-Jaccard verification of an LSH/prefix candidate pair set:
    * restrict the exploded frame to candidate docs (broadcast semi-join —
    * the candidate set is orders of magnitude smaller than the corpus),
    * count intersections with the same inverted-index join, and keep only
    * the candidate pairs. No array materialization, no extra shingle
    * kernel runs.
    *
    * `pairLevel = false` skips the final pair semi-join: correct when the
    * candidate generator is LOSSLESS (d06's prefix filter — every true
    * pair is a candidate, so qualifying pairs among candidate docs ARE the
    * answer). A probabilistic generator (d03's LSH) must keep it, else the
    * output would silently include pairs LSH missed and the recall claim
    * the oracle checks would be vacuous.
    */
  private def verifyCandidates(ex: DataFrame, cand: DataFrame,
      threshold: Double, pairLevel: Boolean = true): DataFrame = {
    val candDocs = cand.select(col("doc_a").as("doc_id"))
      .union(cand.select(col("doc_b").as("doc_id"))).distinct()
    val exC = ex.join(broadcast(candDocs), Seq("doc_id"), "left_semi")
    val exact = jaccardPairs(exC, threshold)
    if (pairLevel) exact.join(broadcast(cand), Seq("doc_a", "doc_b"), "left_semi")
    else exact
  }

  /** Benchmark decontamination against an ARBITRARY eval table (any frame
    * with doc_id + text — benchmark suites shipped as their own parquet
    * in production, a slice of `documents` in the d12 gate): a corpus doc
    * is contaminated if any of its `w`-token windows appears in the eval
    * set. The scale shape is d12's defining point and is independent of
    * where the eval rows come from: eval sets are tiny and the corpus is
    * 100 TB, so the distinct eval window hashes BROADCAST (left-semi)
    * onto the corpus window stream — the corpus is scanned once and never
    * shuffles; the only exchange is the per-doc rollup of the (rare)
    * hits.
    */
  def decontaminate(corpus: DataFrame, evalDocs: DataFrame,
      w: Int = 13): DataFrame = {
    val ev = positionalWindowsOf(evalDocs, w)
      .select(col("span_hash")).distinct()
    positionalWindowsOf(corpus, w)
      .join(broadcast(ev), Seq("span_hash"), "left_semi")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits"), min(col("pos")).as("first_pos"))
      .orderBy("doc_id")
  }

  /** d32's incremental leg over arbitrary frames: fold a NEW eval batch
    * into a persisted decontamination store — `storedHashes` the
    * already-screened eval `span_hash` set, `storedVerdicts` the
    * (doc_id, n_hits, first_pos) rows that screening produced — and
    * return the verdicts as if [[decontaminate]] had run on the union
    * eval set from scratch. Exactness: the never-seen hash set
    * partitions the hit space, so counts ADD and first positions take
    * `least()`; a hash already stored contributes nothing new by
    * construction (the anti-join), so a re-shipped batch is a no-op.
    *
    * Scale: both hash frames are eval-scaled (the d12 broadcast
    * argument), so the anti-join is cheap in any strategy and the
    * surviving fresh set broadcasts onto the corpus window stream —
    * the corpus is scanned once per genuinely-new batch and never
    * shuffles; the verdict merge exchanges only CONTAMINATED rows (the
    * rare set), with the verdict store entering as a scan.
    */
  private[graft] def decontaminateIncrement(corpus: DataFrame,
      storedHashes: DataFrame, storedVerdicts: DataFrame,
      newEval: DataFrame, w: Int = 13): DataFrame = {
    val fresh = positionalWindowsOf(newEval, w)
      .select(col("span_hash")).distinct()
      .join(storedHashes.hint("shuffle_hash"), Seq("span_hash"), "left_anti")
    val delta = positionalWindowsOf(corpus, w)
      .join(broadcast(fresh), Seq("span_hash"), "left_semi")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("d_hits"), min(col("pos")).as("d_first"))
    storedVerdicts
      .select(col("doc_id"), col("n_hits").as("s_hits"),
        col("first_pos").as("s_first"))
      .join(delta, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        (coalesce(col("s_hits"), lit(0L)) + coalesce(col("d_hits"), lit(0L)))
          .as("n_hits"),
        least(col("s_first"), col("d_first")).as("first_pos"))
      .orderBy("doc_id")
  }

  /** Connected components of an undirected pair list (doc_a, doc_b) by
    * alternating large-star / small-star (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC'14): converges in O(log n)
    * rounds regardless of component DIAMETER — where plain min-label
    * propagation needs O(diameter) rounds and a deep path graph would
    * exhaust any fixed cap — and its fixpoint is a star forest in which
    * every node points directly at its component's minimum id.
    *
    *  - large-star(u): every neighbor v > u re-links to
    *    m = min(Γ(u) ∪ {u});
    *  - small-star(u): edges orient high→low, then every low neighbor and
    *    u itself link to the minimum.
    *
    * Each is one groupBy + one self-join on the current edge set; the
    * per-round driver action is the CONVERGENCE CHECK ONLY — one light
    * aggregate (count + order-free xxhash64 xor/sum fingerprint) over the
    * new edge set, compared to the previous round's carried-over
    * fingerprint. Edge rows never leave the executors. Each
    * round CHECKPOINTS eagerly (localCheckpoint): both star ops reference
    * their input several times, so without truncation the logical plan
    * grows multiplicatively per round and the optimizer itself becomes
    * the bottleneck long before the data does — the standard iterative-
    * graph discipline (GraphFrames checkpoints its CC loop the same way).
    * Checkpointed edge frames are a few longs per clustered doc; the
    * ContextCleaner reclaims them when the loop's references drop.
    * Non-convergence within `maxRounds` THROWS: a silent cap would emit
    * plausible-looking wrong labels (the round-4 defect this replaces).
    * 50 rounds covers any graph reachable this side of 2^50 nodes with
    * huge slack.
    *
    * Returns an eagerly-materialized (node, label) frame (localCheckpoint
    * — it is one row per clustered doc, orders of magnitude smaller than
    * the corpus) holding NO persisted inputs, so callers can consume it
    * repeatedly without re-running the loop and nothing leaks into the
    * session cache.
    */
  private[graft] def connectedComponents(pairs: DataFrame,
      maxRounds: Int = 50): DataFrame = {
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      val mins = sym.groupBy("src").agg(min(col("dst")).as("mn"))
        .select(col("src"), least(col("src"), col("mn")).as("m"))
      // no trailing distinct: the only consumer is smallStar, whose
      // first step re-keys and distincts anyway — the duplicates here
      // are bounded by |E| (the mins join is 1:1 per sym row), so
      // deduplicating twice paid an exchange + aggregate per round for
      // nothing
      sym.join(mins, "src")
        .filter(col("dst") > col("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
    }
    def smallStar(e: DataFrame): DataFrame = {
      val or = e.select(greatest(col("src"), col("dst")).as("src"),
        least(col("src"), col("dst")).as("dst")).distinct()
      val mins = or.groupBy("src").agg(min(col("dst")).as("m"))
      or.join(mins, "src")
        .filter(col("dst") =!= col("m"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .union(mins.select(col("src"), col("m").as("dst")))
        .distinct()
    }
    val init = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .distinct().persist()
    // try/finally, not explicit unpersist-per-path: an executor failure
    // inside the loop's actions would otherwise leak the persisted frame
    // into the session cache for the life of the session.
    try {
      val nodes = init.select(col("src").as("node"))
        .union(init.select(col("dst").as("node"))).distinct()
      // Order-free set fingerprint: count + bit-xor + exact-decimal sum of
      // xxhash64(src, dst). Every round's edge set is already DISTINCT
      // (each round ends in smallStar's .distinct()), so fingerprint
      // equality means
      // set equality up to an engineered ~2^-128 collision — the same
      // information the earlier probe bought with two `except`s, i.e. two
      // distinct-aggregating JOINS (~4 extra shuffles) per round that were
      // ~a third of d09's total cost. The previous round's fingerprint is
      // CARRIED OVER, and since round 8 it rides the checkpoint
      // materialization itself via observe() — the aggregates accumulate
      // WHILE the round's edges materialize, so convergence detection
      // launches ZERO extra jobs per round (the earlier formulation
      // re-read the fresh checkpoint once per round; cheap per row, but
      // a whole extra stage launch per round of a many-round loop).
      val fpCols = Seq(
        count(lit(1)).as("n"),
        expr("bit_xor(xxhash64(src, dst))").as("x"),
        sum(xxhash64(col("src"), col("dst")).cast("decimal(38,0)")).as("s"))
      def fpOf(row: org.apache.spark.sql.Row): (Long, Long, java.math.BigDecimal) =
        (row.getLong(0),
          if (row.isNullAt(1)) 0L else row.getLong(1),
          if (row.isNullAt(2)) java.math.BigDecimal.ZERO else row.getDecimal(2))
      var edges = init
      var fpPrev = fpOf(init.agg(fpCols.head, fpCols.tail: _*).collect().head)
      var converged = false
      var rounds = 0
      while (!converged && rounds < maxRounds) {
        val obs = org.apache.spark.sql.Observation(s"cc_round_$rounds")
        val next = smallStar(largeStar(edges))
          .observe(obs, fpCols.head, fpCols.tail: _*)
          .localCheckpoint(true)
        val or = obs.getAsJava
        val fpNext = (
          or.get("n").asInstanceOf[Long],
          Option(or.get("x")).map(_.asInstanceOf[Long]).getOrElse(0L),
          Option(or.get("s")).map(_.asInstanceOf[java.math.BigDecimal])
            .getOrElse(java.math.BigDecimal.ZERO))
        converged = fpNext._1 == fpPrev._1 && fpNext._2 == fpPrev._2 &&
          fpNext._3.compareTo(fpPrev._3) == 0
        edges = next
        fpPrev = fpNext
        rounds += 1
      }
      if (!converged)
        throw new IllegalStateException(
          s"connected components did not converge within $maxRounds " +
            "large/small-star rounds — labels would be silently wrong")
      nodes
        .join(edges.withColumnRenamed("src", "node"), Seq("node"), "left")
        .select(col("node"), coalesce(col("dst"), col("node")).as("label"))
        .localCheckpoint(true)
    } finally init.unpersist()
  }

  val registry: Seq[Q] = Seq(

    Q("d01_exact_dedup",
      "exact duplicate groups by normalized-content hash (canonical = min id)",
      (s, d) => {
        val w = Window.partitionBy(col("content_hash"))
        docs(s, d)
          .select(col("doc_id"), md5(normText(col("text"))).as("content_hash"))
          .withColumn("canonical_id", min(col("doc_id")).over(w))
          .withColumn("group_size", count(lit(1)).over(w))
          .withColumn("is_duplicate", col("doc_id") =!= col("canonical_id"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS content_hash,
             |  min(doc_id) OVER (PARTITION BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))) AS canonical_id,
             |  count(*) OVER (PARTITION BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))) AS group_size,
             |  doc_id <> min(doc_id) OVER (PARTITION BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))) AS is_duplicate
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Eager localCheckpoint before the self-join, like d03/d06/d07: the
    // two join sides' exchanges only canonicalize equal (ReuseExchange)
    // over a common leaf — duplicated MapPartitions (typed-kernel)
    // subtrees do NOT, so an un-materialized frame runs the shingle
    // kernel once per side (measured +40% at sf0.1).
    Q("d02_ngram_jaccard",
      "near-duplicate pairs by exact word-trigram Jaccard >= 0.5",
      (s, d) => jaccardPairs(explodedShingles(s, d).localCheckpoint(true), 0.5)
        .orderBy("doc_a", "doc_b"),
      Some(sqlExactJaccard(0.5))),

    // MinHash + banded LSH — the 100 TB dedup path. 30 permutations,
    // 10 bands x 3 rows: a pair at Jaccard J collides on a band with prob
    // J³, so misses are (1-J³)^10 — 2e-6 at J=0.9 (the data's minimum
    // near-dup similarity), while background pairs (J≈0.05) collide at
    // ~1e-4 per band, keeping the candidate set output-bound rather than
    // |docs|²-bound (r=2 banding admitted J²·|pairs| ≈ 250k spurious
    // candidates at sf0.1; r=3 cuts that ~50×). The oracle is the exact
    // all-pairs answer, so the gate verifies the recall claim itself.
    // Plan shape: one groupBy over exploded shingles (map-side partial
    // min) → band explode → self-join on (band, bucket) → broadcast the
    // tiny candidate set onto per-doc shingle-hash arrays for exact
    // verification (60-bit hashes: set-equality collisions ~1e-13, and
    // long intersects beat string intersects).
    Q("d03_minhash_lsh",
      "MinHash(30) + LSH(10x3) banded candidates, exact-Jaccard verified >= 0.5",
      (s, d) => {
        val ex = explodedShingles(s, d).localCheckpoint(true)
        val cand = bandedCandidates(minhashSigs(ex))
        verifyCandidates(ex, cand, 0.5).orderBy("doc_a", "doc_b")
      },
      Some(sqlExactJaccard(0.5))),

    // Prefix-filtered exact set-similarity join (the PPJoin-family prefix
    // principle, Chaudhuri/Ganti/Kaushik ICDE'06): order each doc's
    // shingles by ascending global frequency; for threshold t a pair with
    // J >= t MUST share an element within both docs' first
    // n − ⌈t·n⌉ + 1 shingles — so the inverted-index join runs only on
    // those prefixes (rarest shingles first), with zero recall loss. The
    // oracle is the exact all-pairs answer, so the gate proves
    // losslessness. Run at t = 0.9 (the planted near-dup level): prefix
    // filtering is the high-threshold workhorse — the prefix is ~n/10, so
    // candidates collapse to ~the true pair set and verification touches
    // only those docs, where d02's full join must group every
    // shingle-sharing pair. (At t = 0.5 the prefix is n/2 and pruning
    // barely pays — that regime belongs to d03's LSH.) At 100 TB this is
    // the exact-dedup path when LSH's probabilistic recall isn't
    // acceptable. Document frequency comes from a map-side-partial
    // groupBy over the exploded frame, joined back with a shuffle-HASH
    // join: the build side is the distinct-shingle counts (bounded per
    // partition), so neither side is sorted — where the earlier
    // window-count formulation sorted every exploded shingle row, and an
    // even earlier broadcast-join one collected every distinct shingle to
    // the driver (wrong at any scale). Prefix selection only needs
    // approximate frequency ORDER, so a Count-Min sketch is a valid
    // substitute when even the aggregation's shuffle is unwelcome.
    Q("d06_prefix_jaccard",
      "prefix-filtered exact trigram-Jaccard join at 0.9 (lossless pruning)",
      (s, d) => {
        val t = 0.9
        val ex = explodedShingles(s, d).localCheckpoint(true)
        val dfCounts = ex.groupBy("shingle").agg(count(lit(1)).as("df"))
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(col("df").asc, col("shingle").asc)
        val prefix = ex.join(dfCounts.hint("shuffle_hash"), Seq("shingle"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= col("nsh") - ceil(col("nsh") * t) + 1)
          .select(col("doc_id"), col("nsh"), col("shingle"))
        // Size filter (J >= t forces t·|a| <= |b| <= |a|/t) prunes pairs
        // before the exchange; pair-level distinct is unnecessary since
        // only the distinct participating DOCS feed verification.
        // Merge-hinted (the jaccardPairs rationale): the prefix frame is
        // ~n/10 of the corpus — a static broadcast off its misestimated
        // size would OOM at scale, and SMJ reuses one exchange instead.
        val cand = prefix.as("x").hint("merge").join(prefix.as("y"), Seq("shingle"))
          .filter(col("x.doc_id") < col("y.doc_id") &&
            col("y.nsh") >= col("x.nsh") * t && col("x.nsh") >= col("y.nsh") * t)
          .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        verifyCandidates(ex, cand, t, pairLevel = false)
          .orderBy("doc_a", "doc_b")
      },
      Some(sqlExactJaccard(0.9))),

    // Frequency-capped n-gram Jaccard — the hot-shingle mitigation d02's
    // comment names, as its own gated operator. Shingles present in more
    // than 1% of documents are dropped from EVERY doc's set before the
    // pair join (the cap is integer-exact: keep iff df * 100 <= ndocs, so
    // both engines agree without float thresholds), and Jaccard is
    // computed over the capped sets. Hot shingles are exactly the ones
    // that blow up the inverted-index join's hottest reducer at 100 TB —
    // a shingle in f docs contributes f² pair rows — while carrying the
    // least similarity signal (boilerplate, stop-phrase trigrams); capping
    // bounds every shingle's fan-out at (0.01·n)² and is the standard
    // recall-preserving step for J >= 0.5 thresholds. Per-doc capped sizes
    // re-attach via shuffle-HASH joins (build sides: distinct-shingle
    // counts, per-doc sizes — both bounded per partition, nothing sorted,
    // nothing broadcast that grows with the corpus).
    Q("d07_capped_jaccard",
      "near-dup pairs by trigram Jaccard >= 0.5 over frequency-capped (df <= 1%) shingle sets",
      (s, d) => {
        val ex = explodedShingles(s, d).localCheckpoint(true)
        val nd = ex.agg(countDistinct(col("doc_id")).as("ndocs"))
        val dfc = ex.groupBy("shingle").agg(count(lit(1)).as("df"))
        val capped = ex.join(dfc.hint("shuffle_hash"), Seq("shingle"))
          .crossJoin(broadcast(nd))
          .filter(col("df") * lit(100) <= col("ndocs"))
          .select("doc_id", "shingle")
        val sizes = capped.groupBy("doc_id").agg(count(lit(1)).as("nsh_c"))
        // merge-hinted self-join over shared ENSURE_REQUIREMENTS
        // exchanges: one shuffle (ReuseExchange), AQE-skew-splittable,
        // never a static broadcast of a misestimated exploded frame —
        // the jaccardPairs rationale
        val cp = capped.join(sizes.hint("shuffle_hash"), Seq("doc_id"))
        val a = cp.select(col("doc_id").as("doc_a"), col("nsh_c").as("size_a"), col("shingle"))
        val b = cp.select(col("doc_id").as("doc_b"), col("nsh_c").as("size_b"), col("shingle"))
        a.hint("merge").join(b, Seq("shingle"))
          .filter(col("doc_a") < col("doc_b"))
          .groupBy("doc_a", "doc_b", "size_a", "size_b")
          .agg(count(lit(1)).as("intersection"))
          .withColumn("jaccard",
            col("intersection") * lit(1.0) /
              (col("size_a") + col("size_b") - col("intersection")))
          .filter(col("jaccard") >= 0.5)
          .select(col("doc_a"), col("doc_b"), col("size_a"), col("size_b"),
            col("intersection"), col("jaccard"))
          .orderBy("doc_a", "doc_b")
      },
      Some(s"""$sqlShingled,
             |ex AS (SELECT doc_id, unnest(sh) AS shingle FROM sh),
             |nd AS (SELECT count(*) AS ndocs FROM sh),
             |dfc AS (SELECT shingle, count(*) AS df FROM ex GROUP BY 1),
             |capped AS (SELECT e.doc_id, e.shingle
             |  FROM ex e JOIN dfc USING (shingle) CROSS JOIN nd
             |  WHERE dfc.df * 100 <= nd.ndocs),
             |sizes AS (SELECT doc_id, count(*)::BIGINT AS nsh_c FROM capped GROUP BY 1),
             |pairs AS (
             |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS intersection
             |  FROM capped a JOIN capped b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2)
             |SELECT doc_a, doc_b, sa.nsh_c AS size_a, sb.nsh_c AS size_b,
             |  intersection,
             |  intersection * 1.0 / (sa.nsh_c + sb.nsh_c - intersection) AS jaccard
             |FROM pairs
             |  JOIN sizes sa ON sa.doc_id = doc_a
             |  JOIN sizes sb ON sb.doc_id = doc_b
             |WHERE intersection * 1.0 / (sa.nsh_c + sb.nsh_c - intersection) >= 0.5
             |ORDER BY doc_a, doc_b""".stripMargin)),

    // Exact duplicated-SPAN detection (the "Deduplicating Training Data
    // Makes Language Models Better" substring-dedup shape, Lee et al.
    // 2022, at word granularity): every 12-token window of every document
    // is hashed WITH its position; windows whose hash appears in 2+
    // distinct documents mark cross-document duplicated text spans — the
    // per-position answer that lets a pipeline CUT the repeated span
    // rather than drop a whole near-dup document. Plan: one typed-kernel
    // pass emits (doc, pos, hash) rows; a map-side-partial groupBy counts
    // distinct docs per hash; qualifying hashes re-attach by shuffle-HASH
    // join. At 100 TB the hot-boilerplate hashes are the d07 story again —
    // the groupBy is count-distinct (output-bound), and a df cap on spans
    // composes the same way. Suffix-array exactness (arbitrary-length
    // spans) trades to fixed windows here — the standard scalable
    // approximation; chained overlapping windows recover longer spans.
    Q("d08_dup_spans",
      "cross-document duplicated 12-token spans (positional window hash, n_docs >= 2)",
      (s, d) => {
        val win = positionalWindows(s, d, 12).localCheckpoint(true)
        val shared = win.groupBy("span_hash")
          .agg(countDistinct(col("doc_id")).as("n_docs"))
          .filter(col("n_docs") >= 2)
        win.join(shared.hint("shuffle_hash"), Seq("span_hash"))
          .select(col("doc_id"), col("pos"), col("span_hash"), col("n_docs"))
          .orderBy("doc_id", "pos")
      },
      Some("""WITH n AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm FROM documents),
             |tk AS (SELECT doc_id, list_filter(string_split(norm, ' '), t -> t <> '') AS toks FROM n),
             |w AS (SELECT doc_id, toks, unnest(range(1, len(toks) - 10)) AS p
             |  FROM tk WHERE len(toks) >= 12),
             |h AS (SELECT doc_id, (p - 1)::BIGINT AS pos,
             |    ('0x' || substr(md5(array_to_string(toks[p:p+11], ' ')), 1, 15))::BIGINT AS span_hash
             |  FROM w),
             |sh AS (SELECT span_hash, count(DISTINCT doc_id)::BIGINT AS n_docs
             |  FROM h GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2)
             |SELECT doc_id, pos, span_hash, n_docs
             |FROM h JOIN sh USING (span_hash)
             |ORDER BY doc_id, pos""".stripMargin)),

    // Frequency-capped duplicated spans — d08 with the d07 hot-key
    // mitigation at span granularity: span hashes present in more than 1%
    // of span-bearing documents are dropped BEFORE the re-attach join.
    // Hot boilerplate spans (headers, licenses, navigation chrome) are
    // exactly the rows that blow up d08's join fan-out at 100 TB — a span
    // in f docs re-attaches f times per position — while marking text a
    // pipeline would cut by document-level rules anyway; the cap bounds
    // every span's fan-out at 0.01·n. The cap is integer-exact
    // (n_docs * 100 <= ndocs) so both engines agree without float
    // thresholds, and ndocs counts span-BEARING docs (>= 12 tokens), the
    // population the frequencies are relative to.
    Q("d10_capped_spans",
      "cross-document duplicated 12-token spans, hot spans (df > 1% of docs) capped out",
      (s, d) => {
        val win = positionalWindows(s, d, 12).localCheckpoint(true)
        val nd = win.agg(countDistinct(col("doc_id")).as("ndocs"))
        val shared = win.groupBy("span_hash")
          .agg(countDistinct(col("doc_id")).as("n_docs"))
          .crossJoin(broadcast(nd))
          .filter(col("n_docs") >= 2 && col("n_docs") * lit(100) <= col("ndocs"))
          .select("span_hash", "n_docs")
        win.join(shared.hint("shuffle_hash"), Seq("span_hash"))
          .select(col("doc_id"), col("pos"), col("span_hash"), col("n_docs"))
          .orderBy("doc_id", "pos")
      },
      Some("""WITH n AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm FROM documents),
             |tk AS (SELECT doc_id, list_filter(string_split(norm, ' '), t -> t <> '') AS toks FROM n),
             |w AS (SELECT doc_id, toks, unnest(range(1, len(toks) - 10)) AS p
             |  FROM tk WHERE len(toks) >= 12),
             |h AS (SELECT doc_id, (p - 1)::BIGINT AS pos,
             |    ('0x' || substr(md5(array_to_string(toks[p:p+11], ' ')), 1, 15))::BIGINT AS span_hash
             |  FROM w),
             |nd AS (SELECT count(DISTINCT doc_id) AS ndocs FROM h),
             |sh AS (SELECT span_hash, count(DISTINCT doc_id)::BIGINT AS n_docs
             |  FROM h GROUP BY 1),
             |keep AS (SELECT span_hash, n_docs FROM sh CROSS JOIN nd
             |  WHERE n_docs >= 2 AND n_docs * 100 <= ndocs)
             |SELECT doc_id, pos, span_hash, n_docs
             |FROM h JOIN keep USING (span_hash)
             |ORDER BY doc_id, pos""".stripMargin)),

    // Connected components over the near-dup pair graph — the step that
    // turns PAIRS into CLUSTERS so dedup keeps one survivor per component
    // (a pair list alone double-drops when A~B and B~C). Implementation is
    // [[connectedComponents]]: alternating large-star/small-star — O(log n)
    // rounds regardless of component diameter, loud failure instead of
    // silently-partial labels if the round cap is ever hit. The oracle
    // computes the same components with a recursive transitive-closure CTE.
    Q("d09_dedup_components",
      "near-dup clusters: connected components of d02's pair graph, canonical = min id",
      (s, d) => {
        val pairs = jaccardPairs(explodedShingles(s, d).localCheckpoint(true), 0.5)
          .select(col("doc_a"), col("doc_b"))
        val labels = connectedComponents(pairs)
        val sizes = labels.groupBy(col("label").as("canonical_id"))
          .agg(count(lit(1)).as("component_size"))
        labels.select(col("node").as("doc_id"), col("label").as("canonical_id"))
          .join(broadcast(sizes), Seq("canonical_id"))
          .select(col("doc_id"), col("canonical_id"), col("component_size"))
          .orderBy("doc_id")
      },
      Some(s"""$sqlComponents
             |SELECT node AS doc_id, least(node, min(r))::BIGINT AS canonical_id,
             |  count(DISTINCT r)::BIGINT AS component_size
             |FROM reach GROUP BY node ORDER BY doc_id""".stripMargin)),

    // Benchmark decontamination — the training-pipeline step that keeps
    // eval data out of the training set (the 13-gram overlap rule of the
    // GPT-3 appendix / PaLM §C): a corpus document is contaminated if ANY
    // of its 13-token windows appears in the eval split (here the
    // deterministic doc_id % 10 = 7 slice; in production, the benchmark
    // suites). Scale shape is the defining point: eval sets are tiny and
    // the corpus is 100 TB, so the distinct eval window hashes BROADCAST
    // (left-semi) onto the corpus window stream — the corpus is scanned
    // once and never shuffles; the only exchange is the per-doc rollup of
    // the (rare) hits. Output: contaminated doc, how many windows hit,
    // where the first hit starts — enough to cut spans instead of
    // dropping documents.
    Q("d12_decontaminate",
      "eval-split decontamination: corpus docs sharing any 13-token window with eval docs",
      (s, d) => {
        // the gate's eval set is the deterministic doc_id % 10 = 7 slice
        // (both frames derive from one table so DuckDB can mirror it);
        // [[decontaminate]] itself takes ANY external eval table —
        // DecontaminateSpec runs that path against an independent fixture
        val all = docs(s, d)
        decontaminate(all.filter(col("doc_id") % 10 =!= 7),
          all.filter(col("doc_id") % 10 === 7))
      },
      Some("""WITH n AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm FROM documents),
             |tk AS (SELECT doc_id, list_filter(string_split(norm, ' '), t -> t <> '') AS toks FROM n),
             |w AS (SELECT doc_id, toks, unnest(range(1, len(toks) - 11)) AS p
             |  FROM tk WHERE len(toks) >= 13),
             |h AS (SELECT doc_id, (p - 1)::BIGINT AS pos,
             |    ('0x' || substr(md5(array_to_string(toks[p:p+12], ' ')), 1, 15))::BIGINT AS span_hash
             |  FROM w),
             |ev AS (SELECT DISTINCT span_hash FROM h WHERE doc_id % 10 = 7)
             |SELECT doc_id, count(*)::BIGINT AS n_hits, min(pos) AS first_pos
             |FROM h JOIN ev USING (span_hash)
             |WHERE doc_id % 10 <> 7
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // SimHash: 60-bit per-doc sketch, zero shuffle — one O(|doc|) typed
    // kernel pass per document ([[Kernels.simhash60]]: hash-map term
    // counts + 60-lane weighted vote), so the operator rides the parquet
    // scan. The earlier column-expression formulation was semantically
    // identical but O(types×tokens) in the INTERPRETED HOF evaluator plus
    // an interpreted md5 per distinct token — 93 s at sf0.1 vs <2 s for
    // this kernel; the CollapseProject×HOF trap graft.functions.Kernels
    // documents.
    Q("d04_simhash",
      "60-bit term-frequency SimHash sketch per document",
      (s, d) => simhashFrame(s, d).orderBy("doc_id"),
      Some(s"$sqlSimhashed\nSELECT doc_id, simhash FROM sk ORDER BY doc_id")),

    // SimHash Hamming-distance pair join — the CONSUMER of d04's sketches
    // and the web-scale dedup design of Manku/Jain/Sarma (WWW'07): a pair
    // within Hamming distance 3 of a 60-bit sketch must, by pigeonhole,
    // agree EXACTLY on at least one of 4 disjoint 15-bit bands — so
    // candidate generation is an equi-join on band values (LOSSLESS, like
    // d06's prefix filter; the oracle is the exact all-pairs answer and
    // proves it), and the all-pairs scan never happens. Band keys fold the
    // band id into one xxhash64 long (the d03 trick); both self-join sides
    // read ONE shared exchange (ReuseExchange), so the sketch
    // kernel runs once per document. At 100 TB: 2^15 buckets per band
    // bound the expected fan-out, and the degenerate hot bucket (all-zero
    // sketches from empty docs) is the d07 frequency-cap story again.
    // FIXED-width caveat (rule 18): unlike d03's 60-bit MinHash bands,
    // 15-bit bands saturate — candidates grow ~n²/2^15 past ~millions
    // of docs. The plan DEGRADES rather than crashes (everything
    // streams through the merge join; nothing here may broadcast), and
    // production widens the sketch/bands with the corpus, trading the
    // pigeonhole radius accordingly.
    Q("d11_simhash_hamming",
      "near-dup pairs at SimHash Hamming distance <= 3 (4x15-bit banded join, pigeonhole-lossless)",
      (s, d) => {
        // eager checkpoint (the d14 discipline): the 16 B/doc sketch frame
        // feeds both self-join sides, so the kernel runs exactly once and
        // the executed pair plan is sketch-only
        val sk = simhashFrame(s, d).localCheckpoint(true)
        // merge-hinted self-join over shared ENSURE_REQUIREMENTS
        // exchanges: one shuffle (ReuseExchange), AQE-skew-splittable,
        // never a broadcast of a corpus-sized band frame (jaccardPairs)
        val bands = sk.select(col("doc_id"), col("simhash"),
          explode(array((0 until 4).map(j =>
            xxhash64(lit(j), shiftright(col("simhash"), 15 * j)
              .bitwiseAND(lit(0x7FFFL)))): _*)).as("bkey"))
        bands.as("x").hint("merge").join(bands.as("y"), Seq("bkey"))
          .filter(col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
            col("x.simhash").as("sa"), col("y.simhash").as("sb"))
          .distinct()
          .withColumn("hamming",
            bit_count(col("sa").bitwiseXOR(col("sb"))).cast("long"))
          .filter(col("hamming") <= 3)
          .select(col("doc_a"), col("doc_b"), col("hamming"))
          .orderBy("doc_a", "doc_b")
      },
      Some(s"""$sqlSimhashed
             |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |  bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
             |FROM sk a JOIN sk b ON a.doc_id < b.doc_id
             |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
             |ORDER BY doc_a, doc_b""".stripMargin)),

    // Embedding-cosine near-dup: the brute-force O(n²) pair scan is the
    // exactness baseline — the dot product is the native codegen'd
    // DotProductD expression (graft.plans), so the whole pair scan is one
    // WholeStageCodegen span; the LSH-bucketed scale path is s02_knn_lsh.
    Q("d05_embedding_neardup",
      "embedding near-duplicate pairs by cosine >= 0.4 (brute-force exact, block-bipartite)",
      (s, d) => {
        // Exact all-pairs WITHOUT broadcasting the corpus: the classic
        // block-bipartite (triangle) join. Each side replicates B× onto
        // a broadcast B×B block grid and the join colocates block pair
        // (ba, bb) = (vec_id_a % B, vec_id_b % B), so every unordered
        // pair meets in EXACTLY one of the B² equi-join groups (the
        // ordered (blk a, blk b) cell; vec_a < vec_b picks the
        // direction). Same n²/2 comparisons as a corpus broadcast, but
        // the memory shape ships: B× row replication through a shuffle
        // (tunable; B² >= cores for parallelism) instead of an n-row
        // broadcast build that OOMs the moment the embedding table
        // outgrows one executor. This stays the deliberately-EXACT
        // baseline the s-family / d13 sketch paths are audited against;
        // at real corpus scale you run those, not this — but this one
        // now degrades in time, not in feasibility.
        graft.plans.VectorExpressions.register(s)
        import s.implicits._
        val B = 8
        val grid = broadcast(
          (for { i <- 0 until B; j <- 0 until B } yield (i, j))
            .toDF("ba", "bb"))
        val e = Tables.embeddings(s, d)
          .select(col("vec_id"), vecD(col("embedding")).as("v"))
          .withColumn("nrm", sqrt(dotFast(col("v"), col("v"))))
        val a = e.select(col("vec_id").as("vec_a"), col("v").as("va"),
          col("nrm").as("na"), pmod(col("vec_id"), lit(B)).cast("int").as("ba"))
          .join(grid, Seq("ba"))
        val b = e.select(col("vec_id").as("vec_b"), col("v").as("vb"),
          col("nrm").as("nb"), pmod(col("vec_id"), lit(B)).cast("int").as("bb"))
          .join(grid, Seq("bb"))
        a.join(b.hint("shuffle_hash"), Seq("ba", "bb"))
          .filter(col("vec_a") < col("vec_b"))
          .withColumn("cosine", dotFast(col("va"), col("vb")) / (col("na") * col("nb")))
          .filter(col("cosine") >= 0.4)
          .select("vec_a", "vec_b")
          .orderBy("vec_a", "vec_b")
      },
      Some("""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
             |n AS (SELECT vec_id, v,
             |  sqrt(list_reduce(list_transform(range(1, 65), i -> v[i] * v[i]), (x, y) -> x + y)) AS nrm
             |FROM e)
             |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
             |FROM n a JOIN n b ON a.vec_id < b.vec_id
             |WHERE list_reduce(list_transform(range(1, 65), i -> a.v[i] * b.v[i]), (x, y) -> x + y)
             |        / (a.nrm * b.nrm) >= 0.4
             |ORDER BY vec_a, vec_b""".stripMargin)),

    // d05's SCALE PATH made concrete (the r11 decade table's one
    // annotated superlinear entry — tools/scaling_caveats.json): exact
    // all-pairs is n²/2 by definition, so at corpus scale you audit a
    // FIXED-SIZE anchor sample instead. Anchors are a deterministic
    // hash gate WINDOWED like every retrieval query set (h60 % 20
    // inside vec_id < 2000 — fixed count as the corpus scales past the
    // window; an un-windowed fraction would still be n²/20). Each
    // anchor is exact-scored against the FULL corpus, so per-anchor
    // results are bit-identical to d05's rows and anchor-incident pair
    // counts are an unbiased density estimate of d05's total (each
    // unordered pair is sampled with the anchor-inclusion probability).
    // Cost: corpus × |anchors| — s01's broadcast-query discipline,
    // linear per decade where d05 is quadratic.
    Q("d28_neardup_sample_audit",
      "exact near-dup audit on a fixed hash-gated anchor sample: every anchor scored against the full corpus, cosine >= 0.4",
      (s, d) => {
        graft.plans.VectorExpressions.register(s)
        val e = Tables.embeddings(s, d)
          .select(col("vec_id"), vecD(col("embedding")).as("v"))
          .withColumn("nrm", sqrt(dotFast(col("v"), col("v"))))
        val anchors = e.filter(
          h60(concat(lit("d28_"), col("vec_id").cast("string"))) % 20 === 0 &&
            col("vec_id") < 2000)
          .select(col("vec_id").as("anchor"), col("v").as("qv"),
            col("nrm").as("qn"))
        e.crossJoin(broadcast(anchors))
          .filter(col("vec_id") =!= col("anchor"))
          .withColumn("cosine",
            dotFast(col("v"), col("qv")) / (col("nrm") * col("qn")))
          .filter(col("cosine") >= 0.4)
          .select(col("anchor"), col("vec_id").as("neighbor"))
          .orderBy("anchor", "neighbor")
      },
      Some("""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
             |n AS (SELECT vec_id, v,
             |  sqrt(list_reduce(list_transform(range(1, 65), i -> v[i] * v[i]), (x, y) -> x + y)) AS nrm
             |FROM e),
             |q AS (SELECT vec_id AS anchor, v AS qv, nrm AS qn FROM n
             |  WHERE ('0x' || substr(md5('d28_' || vec_id), 1, 15))::BIGINT % 20 = 0
             |    AND vec_id < 2000)
             |SELECT q.anchor, n.vec_id AS neighbor
             |FROM n CROSS JOIN q
             |WHERE n.vec_id <> q.anchor
             |  AND list_reduce(list_transform(range(1, 65), i -> n.v[i] * q.qv[i]), (x, y) -> x + y)
             |        / (n.nrm * q.qn) >= 0.4
             |ORDER BY anchor, neighbor""".stripMargin)),

    // Signature-only verification — Broder's resemblance estimator
    // (SEQUENCES'97): a candidate pair's Jaccard is ESTIMATED as the
    // fraction of agreeing MinHash components, never touching the shingle
    // sets again. d03 re-verifies candidates exactly (recall contract);
    // this is the path when re-joining candidate pairs back to a 100 TB
    // exploded-shingle frame is the bottleneck: per-doc state is the
    // 30-long signature (240 B at ANY document size), candidate verify is
    // O(30) per pair, and the estimator's error is the binomial
    // sqrt(J(1−J)/30) — the standard sketch-accuracy trade, audited by a
    // spec against d02's exact answers. Same banded candidate generation
    // as d03 (band keys engine-internal); the oracle regenerates
    // signatures AND band agreement from the same md5-derived
    // permutations, so the gate pins the estimates bit-for-bit.
    Q("d14_minhash_estimate",
      "banded LSH candidates kept by SIGNATURE-agreement estimate (matches/30 >= 0.5), no shingle re-scan",
      (s, d) => {
        // no checkpoint on the exploded frame here: unlike d03 (which
        // re-joins it for exact verification) the shingles feed the
        // signature aggregation ONCE and are never touched again — the
        // signatures are the only thing worth materializing (3 consumers)
        val sigs = minhashSigs(explodedShingles(s, d)).localCheckpoint(true)
        signatureEstimates(bandedCandidates(sigs), sigs)
          .orderBy("doc_a", "doc_b")
      },
      Some(minhashEstimateSql(""))),

    // Incremental batch dedup against a PERSISTED signature store — the
    // production middle path between d14 (both sides sketched in one
    // frame) and nearDupStream (continuous state): TODAY's batch (the
    // deterministic doc_id % 5 = 4 slice) is shingled and signed, the
    // rest of the corpus is represented ONLY by its stored 30-perm
    // signatures, written to and read back from a parquet warehouse
    // table exactly as an ingest pipeline would append them. The dedup
    // plan therefore scans 240 B signature rows for the stored side —
    // never the corpus text (plan-asserted: zero shingle kernels in the
    // executed plan, the store's parquet in its scans). At 100 TB that is
    // the difference between re-reading the warehouse (~100 TB) and
    // reading its signature sidecar (~0.1% of it) per daily batch.
    // Candidates are (new × all) band-agreement pairs — new×stored AND
    // new×new, so a batch with internal dupes still dedups itself — and
    // the verdict is d14's signature-agreement estimator; the oracle is
    // d14's answer restricted to pairs touching the new batch, so the
    // gate proves store-side dedup loses nothing vs re-sketching the
    // whole corpus.
    Q("d15_incremental_neardup",
      "new-batch (doc_id%5=4) near-dup estimates against the persisted signature store, corpus never re-shingled",
      (s, d) => {
        // the warehouse side: built from the input tables ONCE per JVM
        // (StoreFixture — per-process path, no cross-process races), so
        // the gated query itself is consume-only, the cost a daily
        // incremental batch actually pays; in production this parquet is
        // maintained by ingest (batch appends or the streaming
        // DocumentStreams.signatureIngest — the integration spec runs
        // THAT producer against this consumer)
        incrementalNearDup(s, d, sigStorePath(s, d))
      },
      Some(minhashEstimateSql("(a.doc_id % 5 = 4 OR b.doc_id % 5 = 4) AND "))),

    // d15's EXACT twin, completing the incremental-warehouse pair: dedup
    // TODAY's batch against the warehouse's persisted content-hash
    // sidecar — the (content_hash, canonical_id) table an ingest pipeline
    // maintains, one 16-byte-keyed row per DISTINCT document ever seen.
    // Scale shape (the whole point): the batch's distinct hashes
    // BROADCAST left-semi onto the store scan (the d12 pattern), so the
    // store — the big side, ~0.02% of corpus text bytes but still TBs at
    // 100 TB — is scanned once and NEVER shuffled or broadcast
    // (plan-asserted); the surviving store rows are ≤ |batch| and join
    // back broadcast. A new doc's canonical is the min doc_id across
    // store ∪ batch for its hash: least(store canonical if present,
    // batch min) — so batches with internal dupes still dedup
    // themselves, and the oracle (the full-corpus d01 canonical
    // restricted to new docs) proves store-side dedup loses nothing.
    Q("d16_incremental_exact",
      "new-batch (doc_id%5=4) exact dedup against the persisted content-hash store, corpus never re-read",
      (s, d) => incrementalExact(s, d, hashStorePath(s, d)),
      Some("""WITH h AS (SELECT doc_id,
             |    md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS content_hash
             |  FROM documents),
             |c AS (SELECT content_hash, min(doc_id) AS canonical_id FROM h GROUP BY 1)
             |SELECT h.doc_id, h.content_hash, c.canonical_id,
             |  h.doc_id <> c.canonical_id AS is_duplicate
             |FROM h JOIN c USING (content_hash)
             |WHERE h.doc_id % 5 = 4
             |ORDER BY doc_id""".stripMargin)),

    // The CUT step d08 exists to enable (Lee et al. 2022's actual
    // remedy): rather than dropping a whole document for containing
    // boilerplate, REWRITE it with every cross-document duplicated
    // 12-token span removed — tokens covered by ANY window whose hash
    // 2+ distinct documents share are cut, the rest re-join in order.
    // Output per document: token count, tokens cut, and the md5 of the
    // cleaned text (the gate compares the rewrite itself, hash-compact).
    // Plan: d08's window/count-distinct/re-attach shape produces each
    // doc's sorted cut-position list (spans only — ~the duplicated
    // fraction of the corpus, not |tokens| rows); the rewrite is then
    // one typed-kernel pass over (text, cut positions). The corpus
    // shuffles ONCE on doc_id to meet its cut lists (shuffle-hash, spans
    // build side — same discipline as the re-attach); that single
    // shuffle is the cut step's irreducible cost at 100 TB, and docs
    // with no duplicated span skip the state entirely (left join,
    // empty-list fallback).
    Q("d17_span_cut",
      "rewrite documents with cross-document duplicated 12-token spans cut out",
      (s, d) => {
        import s.implicits._
        val w = 12
        val win = positionalWindows(s, d, w).localCheckpoint(true)
        val shared = win.groupBy("span_hash")
          .agg(countDistinct(col("doc_id")).as("n_docs"))
          .filter(col("n_docs") >= 2)
        val cuts = win.join(shared.hint("shuffle_hash"), Seq("span_hash"))
          .groupBy("doc_id")
          .agg(sort_array(collect_set(col("pos"))).as("cut_pos"))
        docs(s, d)
          .join(cuts.hint("shuffle_hash"), Seq("doc_id"), "left")
          .select(col("doc_id"), col("text"),
            coalesce(col("cut_pos"), typedlit(Seq.empty[Long])).as("cut_pos"))
          .as[(Long, String, Seq[Long])]
          .mapPartitions(_.map { case (id, text, cut) =>
            val toks = Kernels.lowerTokens(text)
            val covered = new Array[Boolean](toks.length)
            cut.foreach { p =>
              var i = p.toInt
              val end = math.min(toks.length, p.toInt + w)
              while (i < end) { covered(i) = true; i += 1 }
            }
            val kept = toks.indices.collect { case i if !covered(i) => toks(i) }
            (id, toks.length.toLong, covered.count(identity).toLong,
              md5HexScala(kept.mkString(" ")))
          })
          .toDF("doc_id", "n_tokens", "n_cut", "cleaned_hash")
          .orderBy("doc_id")
      },
      Some("""WITH n AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm FROM documents),
             |tk AS (SELECT doc_id, list_filter(string_split(norm, ' '), t -> t <> '') AS toks FROM n),
             |w AS (SELECT doc_id, toks, unnest(range(1, len(toks) - 10)) AS p
             |  FROM tk WHERE len(toks) >= 12),
             |h AS (SELECT doc_id, (p - 1)::BIGINT AS pos,
             |    ('0x' || substr(md5(array_to_string(toks[p:p+11], ' ')), 1, 15))::BIGINT AS span_hash
             |  FROM w),
             |sh AS (SELECT span_hash FROM h GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2),
             |cut AS (SELECT doc_id, list(DISTINCT pos) AS cps
             |  FROM h JOIN sh USING (span_hash) GROUP BY doc_id)
             |SELECT t.doc_id, len(t.toks)::BIGINT AS n_tokens,
             |  len(list_filter(range(0, len(t.toks)),
             |    i -> len(list_filter(coalesce(c.cps, []::BIGINT[]), q -> i >= q AND i < q + 12)) > 0))::BIGINT AS n_cut,
             |  md5(coalesce(array_to_string(list_transform(
             |    list_filter(range(0, len(t.toks)),
             |      i -> len(list_filter(coalesce(c.cps, []::BIGINT[]), q -> i >= q AND i < q + 12)) = 0),
             |    i -> t.toks[i + 1]), ' '), '')) AS cleaned_hash
             |FROM tk t LEFT JOIN cut c USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

    // Bloom-filter membership prefilter — the approximate-membership
    // sidecar that lets a daily batch SKIP the warehouse store for the
    // overwhelmingly-common case (hash not seen before). The bloom is m
    // bits (m = 4096 here — a knob; ~1.2 bytes/key at 1 % fp in
    // production) with k = 3 md5-derived bit positions per key, so it is
    // orders of magnitude smaller than d16's (hash, canonical) store and
    // BROADCASTS where the store can only be scanned. Crucially the
    // bloom is a pure FOLD like s10's sufficient statistics: bits only
    // turn on, so ingest maintains it by unioning each batch's
    // positions — no rebuild, and a union of per-shard blooms is the
    // corpus bloom. The batch probes the broadcast bit set (k rows/doc,
    // batch-bound groupBy); only bloom-POSITIVE hashes — true dupes
    // plus the bounded false-positive rate — touch the store, via the
    // d16 broadcast-semi onto its scan. No false negatives ever
    // (bloom_hit is implied by is_known, and the oracle recomputes both
    // exactly, false positives included — the gate pins the fp set).
    Q("d18_bloom_prefilter",
      "new-batch (doc_id%5=4) membership prefilter: 4096-bit/3-hash bloom over the hash store, store touched only for positives",
      (s, d) =>
        bloomPrefilterOf(docs(s, d).filter(col("doc_id") % 5 === 4),
          bloomStorePath(s, d), hashStorePath(s, d)),
      Some("""WITH h AS (SELECT doc_id,
             |    md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS content_hash
             |  FROM documents),
             |store AS (SELECT DISTINCT content_hash FROM h WHERE doc_id % 5 <> 4),
             |bits AS (SELECT DISTINCT
             |    ('0x' || substr(md5('bloom' || j || '_' || content_hash), 1, 15))::BIGINT % 4096 AS bit_pos
             |  FROM store, (SELECT unnest(range(0, 3)) AS j)),
             |batch AS (SELECT doc_id, content_hash FROM h WHERE doc_id % 5 = 4),
             |pb AS (SELECT doc_id, content_hash,
             |    ('0x' || substr(md5('bloom' || j || '_' || content_hash), 1, 15))::BIGINT % 4096 AS bit_pos
             |  FROM batch, (SELECT unnest(range(0, 3)) AS j)),
             |hc AS (SELECT doc_id, content_hash, count(b.bit_pos)::BIGINT AS n_hit
             |  FROM pb LEFT JOIN bits b USING (bit_pos) GROUP BY 1, 2)
             |SELECT p.doc_id, p.content_hash, p.n_hit = 3 AS bloom_hit,
             |  s.content_hash IS NOT NULL AS is_known,
             |  (p.n_hit = 3 AND s.content_hash IS NULL) AS false_positive
             |FROM hc p LEFT JOIN store s USING (content_hash)
             |ORDER BY doc_id""".stripMargin)),

    // Cluster canonicalization by QUALITY — what production dedup
    // actually keeps: d09 canonicalizes to the min doc_id (the only
    // choice expressible from ids alone), but a pipeline keeps each
    // duplicate cluster's BEST document (highest quality score, here the
    // t02/t14 alpha-ratio; per-row IEEE division, so both engines rank
    // identically), ties by doc_id. CONSUME-ONLY since round 10: the
    // converged component labels are a persisted warehouse sidecar
    // ([[labelStorePath]] — built once, maintained per batch by
    // [[incrementalLabelsOf]] in production), so this query prices what
    // a daily canonicalization pass actually costs — the score+argmax
    // leg — instead of re-running the whole d09 CC loop inline (the
    // pre-round-10 shape: 4.5 s at sf0.1, ~90 % of it recomputing
    // another query's output). Plan: the label store enters as a SCAN;
    // its rows cover only documents that appear in near-dup pairs — the
    // duplicated minority, orders of magnitude smaller than the corpus —
    // so they BROADCAST onto the scored corpus scan (the d12 pattern;
    // the corpus never shuffles to learn its cluster), and the argmax
    // window runs on the labeled subset only, partitioned by cluster.
    Q("d19_cluster_best",
      "near-dup clusters keep their best-quality doc: argmax(alpha-ratio) per persisted d09 label store, ties by doc_id",
      (s, d) => {
        val labels = s.read.parquet(labelStorePath(s, d))
          .select(col("doc_id"), col("canonical_id"))
        val w = Window.partitionBy(col("canonical_id"))
          .orderBy(col("score").desc, col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        docs(s, d)
          .select(col("doc_id"), col("text"))
          .join(broadcast(labels), Seq("doc_id"))
          // score AFTER the label join: the quality regex runs on the
          // duplicated minority only, not the whole corpus
          .select(col("doc_id"), col("canonical_id"),
            (length(regexp_replace(col("text"), "[^a-z]", "")) * lit(1.0)
              / length(col("text"))).as("score"))
          .withColumn("best_id", first(col("doc_id")).over(w))
          .withColumn("is_kept", col("doc_id") === col("best_id"))
          .select("doc_id", "canonical_id", "score", "best_id", "is_kept")
          .orderBy("doc_id")
      },
      Some(s"""$sqlComponents,
             |lbl AS (SELECT node AS doc_id, least(node, min(r))::BIGINT AS canonical_id
             |  FROM reach GROUP BY node),
             |sc AS (SELECT doc_id,
             |    length(regexp_replace(text, '[^a-z]', '', 'g')) * 1.0 / length(text) AS score
             |  FROM documents),
             |j AS (SELECT l.doc_id, l.canonical_id, sc.score,
             |    first_value(l.doc_id) OVER (PARTITION BY l.canonical_id
             |      ORDER BY sc.score DESC, l.doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS best_id
             |  FROM lbl l JOIN sc USING (doc_id))
             |SELECT doc_id, canonical_id, score, best_id,
             |  doc_id = best_id AS is_kept
             |FROM j ORDER BY doc_id""".stripMargin)),

    // LSH index-quality audit — the tuning report every probabilistic
    // dedup deployment runs before trusting its band geometry: full-outer
    // join the banded candidate pairs (d03's generator) against the exact
    // >= 0.5 Jaccard ground truth (d02's join), roll up to ONE metrics
    // row: recall (true pairs the index surfaced) and precision (surfaced
    // pairs that are true). Both sides reuse the registry's own
    // candidate/truth machinery verbatim — the audit can never drift from
    // what d03 actually ships. Scale shape: both inputs are output-bound
    // pair sets (never |docs|²), the full-outer join keys on the pair
    // (high-cardinality), and the rollup is a single partial-aggregated
    // global sum. The exact side is the expensive leg at 100 TB — in
    // production this audit runs on a deterministic hash-sample of the
    // corpus (the q16 sampler composes in front), sized so the exact join
    // fits; the estimate's variance falls out of the audited pair count,
    // not the corpus size.
    Q("d20_lsh_recall_audit",
      "LSH band-geometry audit: banded candidates vs exact Jaccard>=0.5 truth — one recall/precision row",
      (s, d) => {
        val ex = explodedShingles(s, d).localCheckpoint(true)
        val truth = jaccardPairs(ex, 0.5)
          .select(col("doc_a"), col("doc_b"), lit(1).as("t"))
        val cand = bandedCandidates(minhashSigs(ex))
          .select(col("doc_a"), col("doc_b"), lit(1).as("c"))
        truth.join(cand, Seq("doc_a", "doc_b"), "full_outer")
          .agg(
            count(col("t")).as("n_true"),
            count(col("c")).as("n_cand"),
            count(when(col("t").isNotNull && col("c").isNotNull, lit(1)))
              .as("n_hit"))
          .select(col("n_true"), col("n_cand"), col("n_hit"),
            (col("n_true") - col("n_hit")).as("n_missed"),
            (col("n_cand") - col("n_hit")).as("n_spurious"),
            when(col("n_true") > 0, col("n_hit") * lit(1.0) / col("n_true"))
              .as("recall"),
            when(col("n_cand") > 0, col("n_hit") * lit(1.0) / col("n_cand"))
              .as("precision"))
      },
      Some {
        val aList = MinHashCoeffs.map(_._1).mkString("[", ",", "]")
        val bList = MinHashCoeffs.map(_._2).mkString("[", ",", "]")
        s"""$sqlShingled,
           |ex AS (SELECT doc_id, nsh, unnest(sh) AS shingle FROM sh),
           |tru AS (
           |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           |    a.nsh AS size_a, b.nsh AS size_b, count(*)::BIGINT AS i
           |  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           |  GROUP BY 1, 2, 3, 4
           |  HAVING i * 1.0 / (size_a + size_b - i) >= 0.5),
           |hs AS (SELECT doc_id,
           |    list_transform(sh, g0 -> ('0x' || substr(md5(g0), 1, 15))::BIGINT % 2147483647) AS gs
           |  FROM sh),
           |sig AS (SELECT doc_id, list_transform(range(0, 30), k ->
           |      list_aggregate(list_transform(gs,
           |        g -> (g * ($aList)[k+1] + ($bList)[k+1]) % 2147483647), 'min')) AS sig
           |  FROM hs),
           |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
           |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id
           |  WHERE len(list_filter(range(0, 10), j ->
           |    a.sig[3*j+1] = b.sig[3*j+1] AND a.sig[3*j+2] = b.sig[3*j+2]
           |      AND a.sig[3*j+3] = b.sig[3*j+3])) > 0),
           |fo AS (SELECT
           |    coalesce(t.doc_a, c.doc_a) AS doc_a,
           |    coalesce(t.doc_b, c.doc_b) AS doc_b,
           |    (t.doc_a IS NOT NULL)::INT AS is_t,
           |    (c.doc_a IS NOT NULL)::INT AS is_c
           |  FROM (SELECT doc_a, doc_b FROM tru) t
           |  FULL OUTER JOIN cand c ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b)
           |SELECT sum(is_t)::BIGINT AS n_true, sum(is_c)::BIGINT AS n_cand,
           |  sum(is_t * is_c)::BIGINT AS n_hit,
           |  (sum(is_t) - sum(is_t * is_c))::BIGINT AS n_missed,
           |  (sum(is_c) - sum(is_t * is_c))::BIGINT AS n_spurious,
           |  CASE WHEN sum(is_t) > 0
           |    THEN sum(is_t * is_c) * 1.0 / sum(is_t) END AS recall,
           |  CASE WHEN sum(is_c) > 0
           |    THEN sum(is_t * is_c) * 1.0 / sum(is_c) END AS precision
           |FROM fo""".stripMargin
      }),

    // Source-pair overlap map — "how much does crawl A duplicate
    // crawl B?", the corpus-curation question that decides whether a
    // new source is worth ingesting at all. Per SOURCE union-MinHash
    // (Broder: the min of a permutation over a UNION of sets is the min
    // over the members' mins, so a source's 30-perm signature folds
    // from its docs' shingles by plain min-aggregation), then
    // est_J(A,B) = matching perms / 30 over source PAIRS — d14's
    // estimator lifted from document pairs to source pairs. Same
    // md5-derived permutation family as d03/d14/d15 (one constant
    // table, oracle-regenerated). Scale shape: the corpus is scanned
    // ONCE and collapses map-side — the partial min-agg reduces every
    // partition to |sources|×30 cells before the (tiny) shuffle, the
    // pair join is |sources|² rows on a broadcast, and NO document
    // pair is ever enumerated — at 100 TB this is the only affordable
    // overlap measure (the exact answer is a corpus self-join), with
    // the binomial ±sqrt(J(1-J)/30) accuracy trade d14 documents.
    Q("d21_source_overlap",
      "pairwise source-level Jaccard estimates from per-source union-MinHash signatures (matches/30)",
      (s, d) => sourceOverlapOf(sourceSignatures(docs(s, d))),
      Some {
        val aList = MinHashCoeffs.map(_._1).mkString("[", ",", "]")
        val bList = MinHashCoeffs.map(_._2).mkString("[", ",", "]")
        s"""$sqlShingled,
           |hs AS (SELECT s2.doc_id,
           |    ('0x' || substr(md5(g0), 1, 15))::BIGINT % 2147483647 AS g
           |  FROM sh s2, unnest(s2.sh) AS u(g0)),
           |sg2 AS (SELECT d.source, hs.g
           |  FROM hs JOIN documents d USING (doc_id)),
           |m AS (SELECT source, k.k,
           |    min((g * ($aList)[k.k+1] + ($bList)[k.k+1]) % 2147483647) AS mh
           |  FROM sg2 CROSS JOIN (SELECT unnest(range(0, 30)) AS k) k
           |  GROUP BY source, k.k),
           |sigp AS (SELECT source, list(mh ORDER BY k) AS sig
           |  FROM m GROUP BY source)
           |SELECT a.source AS source_a, b.source AS source_b,
           |  len(list_filter(range(0, 30),
           |    k -> a.sig[k+1] = b.sig[k+1]))::BIGINT AS est_matches,
           |  len(list_filter(range(0, 30),
           |    k -> a.sig[k+1] = b.sig[k+1]))::BIGINT * 1.0 / 30 AS est_jaccard
           |FROM sigp a JOIN sigp b ON a.source < b.source
           |ORDER BY source_a, source_b""".stripMargin
      }),

    // One-sided prefix-filtered CONTAINMENT join — the asymmetric overlap
    // measure c(A,B) = |A∩B| / |A| over trigram sets. This is a distinct
    // dedup family from d02/d03/d06: a short doc embedded verbatim in a
    // much longer one (truncation, quote-expansion, boilerplate wrapping —
    // the classic crawl-dup shapes) has c = 1.0 but Jaccard ≈ |A|/|B|,
    // structurally INVISIBLE to any symmetric threshold, and LSH over
    // full-set MinHash misses it for the same reason. The prefix principle
    // adapts one-sidedly (Chaudhuri/Ganti/Kaushik ICDE'06 divide-merge;
    // Xiao et al. WWW'08 §3): order A's shingles by ascending global df;
    // if c(A,B) >= t then B must contain one of A's first
    // ⌊(1−t)·|A|⌋+1 rarest shingles (else the intersection tops out below
    // t·|A|) — so only the CONTAINED side is prefix-pruned (~(1−t) of the
    // exploded corpus at t=0.9) and the index side keeps its full sets.
    // Candidate volume stays output-bound precisely BECAUSE the prefix
    // keeps each doc's df-RAREST shingles: a prefix row on shingle g
    // fans out to at most df(g) index rows, and df-ascending ordering
    // biases the prefix toward df≈1. The size filter |B| >= t·|A| (an
    // upper bound on achievable containment) prunes before the exchange.
    // Verification recomputes exact intersections over candidate docs
    // only; the filter is lossless, so qualifying ordered pairs among
    // candidate docs ARE the answer (the d06 pairLevel=false argument).
    // At 100 TB: both joins are shuffle-partitioned on the shingle with
    // AQE skew-split headroom; nothing corpus-sized broadcasts; the
    // df-cap mitigation (d07) composes if the corpus carries hot
    // boilerplate shingles.
    Q("d22_containment",
      "contained-doc pairs by one-sided prefix filter: trigram containment |A∩B|/|A| >= 0.9",
      (s, d) => containmentJoin(docs(s, d), 0.9),
      Some(sqlExactContainment(0.9))),

    // Containment ESTIMATION from signatures — d22's screening path when
    // even the one-sided prefix join is too hot: Broder's Ĵ =
    // matches/30 plus the EXACT set sizes (one long per doc, carried in
    // the signature sidecar) algebraically recover the intersection,
    // |A∩B| = J/(1+J)·(|A|+|B|), hence ĉ(A,B) = Ĵ/(1+Ĵ)·(|A|+|B|)/|A| —
    // both orientations from ONE estimate, O(30) per pair, shingles never
    // re-touched (the d14 discipline). Scope is honest and documented:
    // candidates are the full-set-MinHash LSH bands, whose recall decays
    // with symmetric J — a low-J containment (tiny doc in huge doc) needs
    // d22's exact one-sided join; THIS operator prices the common case
    // (competitive sizes, J ≥ ~0.5) at sketch cost and flags both
    // directions. ĉ can exceed 1 (estimator noise); emitted raw so the
    // audit spec can measure the error against d22's exact answer.
    // Shape: signature/size attaches are merge-hinted SMJs and
    // shuffle-hash joins (corpus-proportional sides never broadcast);
    // the estimate filter is a map-side projection after them.
    Q("d23_containment_estimate",
      "both-direction containment estimates from MinHash signatures + exact sizes, banded candidates",
      (s, d) => {
        val ex = explodedShingles(s, d).localCheckpoint(true)
        val sizes = ex.groupBy("doc_id").agg(max(col("nsh")).as("nsh"))
        val sigs = minhashSigs(ex).localCheckpoint(true)
        val cand = bandedCandidates(sigs)
        val est = signatureAttach(cand, sigs)
          .select("doc_a", "doc_b", "est_matches")
        est
          .join(sizes.select(col("doc_id").as("doc_a"),
            col("nsh").as("size_a")).hint("shuffle_hash"), Seq("doc_a"))
          .join(sizes.select(col("doc_id").as("doc_b"),
            col("nsh").as("size_b")).hint("shuffle_hash"), Seq("doc_b"))
          .withColumn("est_j", col("est_matches") * lit(1.0) / 30)
          .withColumn("est_c_a_in_b",
            col("est_j") / (lit(1.0) + col("est_j"))
              * (col("size_a") + col("size_b")) / col("size_a"))
          .withColumn("est_c_b_in_a",
            col("est_j") / (lit(1.0) + col("est_j"))
              * (col("size_a") + col("size_b")) / col("size_b"))
          .filter(greatest(col("est_c_a_in_b"), col("est_c_b_in_a")) >= 0.85)
          .select(col("doc_a"), col("doc_b"),
            col("size_a").cast("long"), col("size_b").cast("long"),
            col("est_matches"), col("est_c_a_in_b"), col("est_c_b_in_a"))
          .orderBy("doc_a", "doc_b")
      },
      Some(sqlContainmentEstimate(""))),

    // The PRODUCTION containment path — d23's sketch screen COMPOSED
    // with d22's exact verify, priced as the one plan a pipeline ships
    // (before round 10 the two legs were only priced separately). The
    // screen keeps banded pairs whose estimated containment clears 0.85
    // in either direction — a 0.05 MARGIN below the verify threshold
    // 0.9, absorbing the ±sqrt(c(1-c)/30) estimator noise band (d14's
    // binomial argument; the recall spec measures what the margin
    // misses); the verify leg then recomputes exact intersections over
    // the SCREENED docs only and keeps ordered pairs that (a) clear the
    // exact threshold and (b) arose from a screened candidate — so the
    // answer is exactly d22 restricted to the screen, which is also
    // what the oracle computes. Scope inherits d23's honesty: the
    // candidates are full-set LSH bands, so low-J containments (tiny
    // doc inside a huge one) are invisible to the screen — d22's
    // one-sided prefix join remains the exact tool for those; THIS
    // query prices the competitive-size common case. Shape: ONE shingle
    // kernel pass (the checkpointed exploded frame feeds signatures,
    // sizes AND the verify's inverted index — ReusedExchange, plan-
    // asserted); the screened pair set is output-bound and BROADCASTS
    // into both the doc restriction and the pair-level semi-join; at
    // 100 TB the exact leg touches only screened docs' shingles, the
    // property that makes the composition affordable where d22 alone
    // prefix-scans the whole corpus.
    Q("d24_containment_screened",
      "production containment: d23 sketch screen (margin 0.85) feeding d22's exact verify at t=0.9",
      (s, d) => {
        val ex = explodedShingles(s, d).localCheckpoint(true)
        val sizes = ex.groupBy("doc_id").agg(max(col("nsh")).as("nsh"))
        val sigs = minhashSigs(ex).localCheckpoint(true)
        val est = signatureAttach(bandedCandidates(sigs), sigs)
          .select(col("doc_a"), col("doc_b"),
            (col("est_matches") * lit(1.0) / 30).as("est_j"))
        val screened = est
          .join(sizes.select(col("doc_id").as("doc_a"),
            col("nsh").as("size_a")).hint("shuffle_hash"), Seq("doc_a"))
          .join(sizes.select(col("doc_id").as("doc_b"),
            col("nsh").as("size_b")).hint("shuffle_hash"), Seq("doc_b"))
          .filter(greatest(
            col("est_j") / (lit(1.0) + col("est_j"))
              * (col("size_a") + col("size_b")) / col("size_a"),
            col("est_j") / (lit(1.0) + col("est_j"))
              * (col("size_a") + col("size_b")) / col("size_b")) >= 0.85)
          .select(col("doc_a"), col("doc_b"))
          // output-bound by the screen: materialize once, broadcast into
          // both verify-leg joins below
          .localCheckpoint(true)
        containmentPairs(restrictToCandidateDocs(ex, screened), 0.9)
          // doc-level restriction over-generates (two screened docs can
          // meet through partners outside their screened pair) — keep
          // exactly the screened PAIRS, either orientation
          .join(broadcast(screened.select(col("doc_a").as("ka"),
              col("doc_b").as("kb"))),
            least(col("doc_a"), col("doc_b")) === col("ka") &&
              greatest(col("doc_a"), col("doc_b")) === col("kb"),
            "left_semi")
          .orderBy("doc_a", "doc_b")
      },
      Some {
        val aList = MinHashCoeffs.map(_._1).mkString("[", ",", "]")
        val bList = MinHashCoeffs.map(_._2).mkString("[", ",", "]")
        s"""$sqlShingled,
           |hs AS (SELECT doc_id,
           |    list_transform(sh, g0 -> ('0x' || substr(md5(g0), 1, 15))::BIGINT % 2147483647) AS gs
           |  FROM sh),
           |sig AS (SELECT doc_id, list_transform(range(0, 30), k ->
           |      list_aggregate(list_transform(gs,
           |        g -> (g * ($aList)[k+1] + ($bList)[k+1]) % 2147483647), 'min')) AS sig
           |  FROM hs),
           |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sig AS sa, b.sig AS sb
           |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id
           |  WHERE len(list_filter(range(0, 10), j ->
           |    a.sig[3*j+1] = b.sig[3*j+1] AND a.sig[3*j+2] = b.sig[3*j+2]
           |      AND a.sig[3*j+3] = b.sig[3*j+3])) > 0),
           |est AS (SELECT doc_a, doc_b,
           |    len(list_filter(range(0, 30), k -> sa[k+1] = sb[k+1])) * 1.0 / 30 AS est_j
           |  FROM cand),
           |scr AS (SELECT e.doc_a, e.doc_b
           |  FROM est e JOIN sh a ON e.doc_a = a.doc_id
           |    JOIN sh b ON e.doc_b = b.doc_id
           |  WHERE greatest(est_j / (1.0 + est_j) * (a.nsh + b.nsh) / a.nsh,
           |    est_j / (1.0 + est_j) * (a.nsh + b.nsh) / b.nsh) >= 0.85),
           |ex AS (SELECT doc_id, nsh, unnest(sh) AS shingle FROM sh),
           |pairs AS (
           |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           |    a.nsh AS size_a, b.nsh AS size_b, count(*)::BIGINT AS intersection
           |  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
           |  GROUP BY 1, 2, 3, 4)
           |SELECT p.doc_a, p.doc_b, p.size_a::BIGINT AS size_a,
           |  p.size_b::BIGINT AS size_b, p.intersection,
           |  p.intersection * 1.0 / p.size_a AS containment
           |FROM pairs p JOIN scr s
           |  ON least(p.doc_a, p.doc_b) = s.doc_a
           |  AND greatest(p.doc_a, p.doc_b) = s.doc_b
           |WHERE p.intersection * 1.0 / p.size_a >= 0.9
           |ORDER BY p.doc_a, p.doc_b""".stripMargin
      }),

    // The containment family's STORE leg, completing its batch (d23) /
    // stream (containmentStream) / incremental triad in the d15 mold:
    // TODAY's batch (doc_id % 5 = 4) is shingled and sized; the rest of
    // the corpus is represented ONLY by the persisted signature+size
    // sidecar — d15's store schema plus one long (`nsh`), which is all
    // containment needs over symmetric-J (the d23 algebra recovers both
    // orientations' ĉ from Ĵ + exact sizes). ONE physical sidecar
    // serves d15 and d25; consumers select the columns they own. Scale
    // shape is incrementalNearDup's: the batch's band rows broadcast
    // explicitly, the store's band rows STREAM (never shuffled, never
    // broadcast — relying on size estimates would shuffle the store the
    // day the estimate is off); the oracle is d23's answer restricted
    // to pairs touching the batch, proving store-side screening loses
    // nothing vs re-sketching the corpus.
    Q("d25_incremental_containment",
      "new-batch (doc_id%5=4) containment screen against the persisted signature+size sidecar",
      (s, d) => incrementalContainment(s, d, sigStorePath(s, d)),
      Some(sqlContainmentEstimate("(a.doc_id % 5 = 4 OR b.doc_id % 5 = 4) AND "))),

    // Cluster-size histogram — the distribution every dedup paper
    // reports (and the number that DECIDES the dedup budget: the share
    // of the corpus sitting in size-k clusters IS the fraction dedup
    // can reclaim, and a heavy tail says one boilerplate template
    // dominates). Consume-only against the d19 label sidecar (rule
    // 4/8: the CC build is the store producer's amortized cost, this
    // query prices the report); docs absent from the store — the
    // non-duplicated majority — are their own size-1 clusters via the
    // left-join coalesce, so doc conservation holds by construction
    // (spec-pinned: sizes tile the corpus). Shape: ONE corpus-id scan
    // left-joins the store SHUFFLED on doc_id (the store is
    // corpus-minority but still corpus-scale at 100 TB — never a
    // broadcast), one canonical-keyed exchange for sizes, the
    // histogram rollup collapses map-side to |distinct sizes| rows,
    // and the share denominator is a global window over THOSE rows —
    // the tiling invariant makes a second corpus scan unnecessary.
    Q("d26_cluster_histogram",
      "near-dup cluster size distribution: clusters, docs and corpus share per component size (singletons included)",
      (s, d) => {
        val labels = s.read.parquet(labelStorePath(s, d))
          .select(col("doc_id"), col("canonical_id"))
        val sizes = docs(s, d).select(col("doc_id"))
          .join(labels.hint("shuffle_hash"), Seq("doc_id"), "left")
          .select(coalesce(col("canonical_id"), col("doc_id"))
            .as("canonical_id"))
          .groupBy("canonical_id")
          .agg(count(lit(1)).as("component_size"))
        // the denominator comes from the histogram itself (buckets tile
        // the corpus — spec-pinned), so the corpus-id column is scanned
        // exactly once; the global window runs over <=|distinct sizes|
        // rows
        sizes.groupBy("component_size")
          .agg(count(lit(1)).as("n_clusters"))
          .withColumn("n_docs", col("component_size") * col("n_clusters"))
          .withColumn("doc_share", col("n_docs") * lit(1.0) /
            sum(col("n_docs")).over(Window.partitionBy()))
          .select(col("component_size"), col("n_clusters"),
            col("n_docs"), col("doc_share"))
          .orderBy("component_size")
      },
      Some(s"""$sqlComponents,
             |lab AS (SELECT node AS doc_id, least(node, min(r))::BIGINT AS canonical_id
             |  FROM reach GROUP BY node),
             |canon AS (SELECT coalesce(lab.canonical_id, dd.doc_id) AS canonical_id
             |  FROM documents dd LEFT JOIN lab ON dd.doc_id = lab.doc_id),
             |sz AS (SELECT canonical_id, count(*)::BIGINT AS component_size
             |  FROM canon GROUP BY 1)
             |SELECT component_size, count(*)::BIGINT AS n_clusters,
             |  (component_size * count(*))::BIGINT AS n_docs,
             |  (component_size * count(*)) * 1.0
             |    / sum(component_size * count(*)) OVER () AS doc_share
             |FROM sz GROUP BY component_size
             |ORDER BY component_size""".stripMargin)),

    // Suffix-array-style substring dedup — the exact variable-length
    // answer d08/d10 approximate with fixed 12-token windows. See
    // [[maximalDupSpans]] for the algorithm and scale story: one
    // anchor-sharded suffix sort, lag/lead LCP, per-doc left-maximality.
    // The oracle recomputes the identical suffix order + LCP windows in
    // SQL; dup_len is engine-sort-independent (max-LCP over a multiset),
    // so both engines agree bit-exactly even where their tie-breaking
    // differs.
    Q("d27_max_dup_spans",
      "maximal duplicated substrings >= 12 tokens (sorted-suffix neighbor LCP, capped at 64)",
      (s, d) => maximalDupSpans(docs(s, d)),
      Some("""WITH n AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm FROM documents),
             |tk AS (SELECT doc_id, list_filter(string_split(norm, ' '), t -> t <> '') AS toks FROM n),
             |sf AS (SELECT doc_id, toks, unnest(range(1, len(toks) - 10)) AS p
             |  FROM tk WHERE len(toks) >= 12),
             |k AS (SELECT doc_id, (p - 1)::BIGINT AS pos,
             |    ('0x' || substr(md5(array_to_string(toks[p:p+3], ' ')), 1, 15))::BIGINT AS anchor,
             |    toks[p:p+63] AS key
             |  FROM sf),
             |nb AS (SELECT doc_id, pos, key,
             |    lag(key) OVER (PARTITION BY anchor ORDER BY key) AS pk,
             |    lead(key) OVER (PARTITION BY anchor ORDER BY key) AS nk
             |  FROM k),
             |d AS (SELECT doc_id, pos, greatest(
             |    CASE WHEN pk IS NULL THEN 0
             |      ELSE coalesce(nullif(list_position(list_transform(range(1, greatest(len(key), len(pk)) + 1),
             |        i -> coalesce(key[i] = pk[i], false)), false), 0) - 1, least(len(key), len(pk))) END,
             |    CASE WHEN nk IS NULL THEN 0
             |      ELSE coalesce(nullif(list_position(list_transform(range(1, greatest(len(key), len(nk)) + 1),
             |        i -> coalesce(key[i] = nk[i], false)), false), 0) - 1, least(len(key), len(nk))) END
             |  )::BIGINT AS dup_len FROM nb),
             |m AS (SELECT doc_id, pos, dup_len,
             |    lag(dup_len) OVER (PARTITION BY doc_id ORDER BY pos) AS prev_len FROM d)
             |SELECT doc_id, pos, dup_len AS len FROM m
             |WHERE dup_len >= 12 AND (prev_len IS NULL OR prev_len < dup_len + 1)
             |ORDER BY doc_id, pos""".stripMargin)),

    // LSH geometry tuning curve — d20's single-geometry audit swept
    // across the (bands × rows) knob, the dedup analog of s21's funnel
    // curve: over the SAME 30-perm signatures, candidates for
    // (30×1), (15×2), (10×3), (6×5) priced against the exact
    // Jaccard ≥ 0.5 truth in one shared pass. This is THE published
    // LSH design trade (the S-curve: collision probability
    // 1 − (1 − J^r)^b, midpoint ≈ (1/b)^(1/r) — emitted per geometry
    // as a literal, 0.033 / 0.258 / 0.464 / 0.699, so the measured
    // recall/precision sits next to the theory that predicts it):
    // more bands × fewer rows catches lower-J pairs at the cost of
    // candidate volume; the curve says which geometry a target
    // threshold needs. Counts are integer intersections (hash-gated);
    // each recall/precision is one IEEE division. Scale shape: ONE
    // shingle pass + ONE signature aggregation feed all four
    // geometries; each geometry's candidates come from the SAME banded
    // merge-join discipline as d03 (bucket join on the band hash, never
    // all-pairs — the oracle's all-pairs spelling is fixture-only);
    // truth is the d20 shingle-join; the full-outer reconcile runs on
    // candidate∪truth pairs (output-bound), the final grid is 4 rows.
    Q("d29_lsh_geometry_curve",
      "LSH (bands x rows) tuning curve over one signature set: recall/precision vs exact J>=0.5 truth per geometry, S-curve midpoint alongside",
      (s, d) => {
        import s.implicits._
        val ex = explodedShingles(s, d).localCheckpoint(true)
        val sigs = minhashSigs(ex).localCheckpoint(true)
        val truth = jaccardPairs(ex, 0.5)
          .select(col("doc_a"), col("doc_b"), lit(1).as("t"))
        val geomDf = broadcast(LshGeometries
          .map { case (nb, r, mid) => (nb, r, mid) }
          .toDF("n_bands", "rows_per_band", "s_curve_midpoint"))
        val cands = LshGeometries.map { case (nb, r, _) =>
          bandedCandidatesG(sigs, nb, r)
            .select(lit(nb).as("n_bands"), lit(r).as("rows_per_band"),
              col("doc_a"), col("doc_b"), lit(1).as("c"))
        }.reduce(_ unionByName _)
        val truthG = truth
          .crossJoin(broadcast(geomDf.select("n_bands", "rows_per_band")))
        truthG
          .join(cands,
            Seq("n_bands", "rows_per_band", "doc_a", "doc_b"), "full_outer")
          .groupBy("n_bands", "rows_per_band")
          .agg(count(col("t")).as("n_true"), count(col("c")).as("n_cand"),
            count(when(col("t").isNotNull && col("c").isNotNull, lit(1)))
              .as("n_hit"))
          .join(geomDf, Seq("n_bands", "rows_per_band"))
          .select(col("n_bands"), col("rows_per_band"),
            col("s_curve_midpoint"), col("n_true"), col("n_cand"),
            col("n_hit"),
            when(col("n_true") > 0, col("n_hit") * lit(1.0) / col("n_true"))
              .as("recall"),
            when(col("n_cand") > 0, col("n_hit") * lit(1.0) / col("n_cand"))
              .as("precision"))
          .orderBy("rows_per_band")
      },
      Some {
        val aList = MinHashCoeffs.map(_._1).mkString("[", ",", "]")
        val bList = MinHashCoeffs.map(_._2).mkString("[", ",", "]")
        val geomVals = LshGeometries.map { case (nb, r, mid) =>
          s"($nb, $r, $mid)"
        }.mkString(", ")
        val candLegs = LshGeometries.map { case (nb, r, _) =>
          val rowsEq = (1 to r)
            .map(i => s"a.sig[$r*j+$i] = b.sig[$r*j+$i]").mkString(" AND ")
          s"""SELECT $nb AS n_bands, $r AS rows_per_band,
             |    a.doc_id AS doc_a, b.doc_id AS doc_b
             |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id
             |  WHERE len(list_filter(range(0, $nb), j -> $rowsEq)) > 0"""
            .stripMargin
        }.mkString("\n  UNION ALL\n  ")
        s"""$sqlShingled,
           |ex AS (SELECT doc_id, nsh, unnest(sh) AS shingle FROM sh),
           |tru AS (
           |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           |    a.nsh AS size_a, b.nsh AS size_b, count(*)::BIGINT AS i
           |  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           |  GROUP BY 1, 2, 3, 4
           |  HAVING i * 1.0 / (size_a + size_b - i) >= 0.5),
           |hs AS (SELECT doc_id,
           |    list_transform(sh, g0 -> ('0x' || substr(md5(g0), 1, 15))::BIGINT % 2147483647) AS gs
           |  FROM sh),
           |sig AS (SELECT doc_id, list_transform(range(0, 30), k ->
           |      list_aggregate(list_transform(gs,
           |        g -> (g * ($aList)[k+1] + ($bList)[k+1]) % 2147483647), 'min')) AS sig
           |  FROM hs),
           |geoms AS (SELECT * FROM (VALUES $geomVals)
           |  AS g(n_bands, rows_per_band, s_curve_midpoint)),
           |cand AS (
           |  $candLegs),
           |tg AS (SELECT g.n_bands, g.rows_per_band, t.doc_a, t.doc_b
           |  FROM (SELECT doc_a, doc_b FROM tru) t CROSS JOIN geoms g),
           |fo AS (SELECT
           |    coalesce(t.n_bands, c.n_bands) AS n_bands,
           |    coalesce(t.rows_per_band, c.rows_per_band) AS rows_per_band,
           |    (t.doc_a IS NOT NULL)::INT AS is_t,
           |    (c.doc_a IS NOT NULL)::INT AS is_c
           |  FROM tg t FULL OUTER JOIN cand c
           |    ON t.n_bands = c.n_bands AND t.rows_per_band = c.rows_per_band
           |    AND t.doc_a = c.doc_a AND t.doc_b = c.doc_b),
           |gr AS (SELECT n_bands, rows_per_band,
           |    sum(is_t)::BIGINT AS n_true, sum(is_c)::BIGINT AS n_cand,
           |    sum(is_t * is_c)::BIGINT AS n_hit
           |  FROM fo GROUP BY 1, 2)
           |SELECT gr.n_bands::INT AS n_bands, gr.rows_per_band::INT AS rows_per_band,
           |  g.s_curve_midpoint, n_true, n_cand, n_hit,
           |  CASE WHEN n_true > 0 THEN n_hit * 1.0 / n_true END AS recall,
           |  CASE WHEN n_cand > 0 THEN n_hit * 1.0 / n_cand END AS precision
           |FROM gr JOIN geoms g
           |  ON gr.n_bands = g.n_bands AND gr.rows_per_band = g.rows_per_band
           |ORDER BY gr.rows_per_band""".stripMargin
      }),

    // Store CONSISTENCY audit — the ops check every incremental-dedup
    // deployment needs and none of d15-d25 provides: the persisted hash
    // sidecar (d16's store, consumed as-is) is only correct while the
    // corpus it indexed doesn't move under it. Edits after storage
    // split one hash into an ORPHAN (a stored hash no current doc
    // carries — the store would vouch for text that no longer exists)
    // and a MISSING (a current hash the store has never seen — dedup
    // would wrongly treat it as novel); unedited content stays
    // CONSISTENT. The drift stands in deterministically (docs with
    // doc_id % 11 = 7 in the stored slice re-hash with a '!' suffix on
    // the normalized text — the m01/t29 stand-in discipline: the
    // simulation is throwaway, the three-way full-outer reconciliation
    // is the operator), and the corpus's real exact-dup structure
    // participates: an edited doc whose text a sibling still carries
    // orphans nothing. Scale shape: two hash-grain frames (the store
    // scan and one corpus hash rollup), one full-outer join on the
    // hash — group grain end to end after the rollup, the store never
    // broadcast (d15's rule: stores enter plans as scans).
    Q("d30_store_consistency",
      "hash-store drift audit: consistent / orphaned / missing verdicts from a three-way reconciliation at hash grain",
      (s, d) => {
        val current = docs(s, d).filter(!(col("doc_id") % 5 === 4))
          .select(col("doc_id"),
            md5(concat(graft.functions.Portable.normText(col("text")),
              when(col("doc_id") % 11 === 7, "!").otherwise("")))
              .as("content_hash"))
          .groupBy("content_hash")
          .agg(min(col("doc_id")).as("current_canonical"))
        val store = s.read.parquet(hashStorePath(s, d))
        store.join(current, Seq("content_hash"), "full_outer")
          .select(col("content_hash"),
            when(col("stored_canonical").isNotNull &&
              col("current_canonical").isNotNull, "consistent")
              .when(col("current_canonical").isNull, "orphaned")
              .otherwise("missing").as("status"),
            col("stored_canonical"), col("current_canonical"))
          .orderBy("content_hash")
      },
      Some("""WITH stored_slice AS (SELECT doc_id, text FROM documents
             |  WHERE doc_id % 5 <> 4),
             |store AS (SELECT
             |    md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS content_hash,
             |    min(doc_id) AS stored_canonical
             |  FROM stored_slice GROUP BY 1),
             |current AS (SELECT
             |    md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')) ||
             |      CASE WHEN doc_id % 11 = 7 THEN '!' ELSE '' END) AS content_hash,
             |    min(doc_id) AS current_canonical
             |  FROM stored_slice GROUP BY 1)
             |SELECT coalesce(s.content_hash, c.content_hash) AS content_hash,
             |  CASE WHEN s.stored_canonical IS NOT NULL
             |        AND c.current_canonical IS NOT NULL THEN 'consistent'
             |       WHEN c.current_canonical IS NULL THEN 'orphaned'
             |       ELSE 'missing' END AS status,
             |  s.stored_canonical, c.current_canonical
             |FROM store s FULL OUTER JOIN current c
             |  ON s.content_hash = c.content_hash
             |ORDER BY content_hash""".stripMargin)),

    // Substring-level eval decontamination — [[crossDupSpans]] over
    // d12's deterministic eval split: maximal train-doc spans (>= 12
    // tokens, capped at 64) that also occur ANYWHERE in the eval slice,
    // with exact positions/lengths so the fix is d17's span cut, not a
    // doc drop. The oracle recomputes the identical union'd suffix
    // order with the side-deterministic tie-break and the two
    // nearest-eval windows in SQL (IGNORE NULLS running frames);
    // dup_len is engine-sort-independent as in d27.
    Q("d31_decontam_spans",
      "cross-corpus substring decontamination: maximal train spans >= 12 tokens occurring in the eval split, exact positions + lengths",
      (s, d) => {
        val all = docs(s, d)
        crossDupSpans(all.filter(col("doc_id") % 10 =!= 7),
          all.filter(col("doc_id") % 10 === 7))
      },
      Some("""WITH n AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm FROM documents),
             |tk AS (SELECT doc_id, list_filter(string_split(norm, ' '), t -> t <> '') AS toks FROM n),
             |sf AS (SELECT doc_id, toks, unnest(range(1, len(toks) - 10)) AS p
             |  FROM tk WHERE len(toks) >= 12),
             |k AS (SELECT doc_id, (doc_id % 10 = 7)::INT AS side, (p - 1)::BIGINT AS pos,
             |    ('0x' || substr(md5(array_to_string(toks[p:p+3], ' ')), 1, 15))::BIGINT AS anchor,
             |    toks[p:p+63] AS key
             |  FROM sf),
             |nb AS (SELECT doc_id, side, pos, key,
             |    last_value(CASE WHEN side = 1 THEN key END IGNORE NULLS) OVER
             |      (PARTITION BY anchor ORDER BY key ASC, side ASC
             |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe,
             |    last_value(CASE WHEN side = 1 THEN key END IGNORE NULLS) OVER
             |      (PARTITION BY anchor ORDER BY key DESC, side DESC
             |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ne
             |  FROM k),
             |d AS (SELECT doc_id, pos, greatest(
             |    CASE WHEN pe IS NULL THEN 0
             |      ELSE coalesce(nullif(list_position(list_transform(range(1, greatest(len(key), len(pe)) + 1),
             |        i -> coalesce(key[i] = pe[i], false)), false), 0) - 1, least(len(key), len(pe))) END,
             |    CASE WHEN ne IS NULL THEN 0
             |      ELSE coalesce(nullif(list_position(list_transform(range(1, greatest(len(key), len(ne)) + 1),
             |        i -> coalesce(key[i] = ne[i], false)), false), 0) - 1, least(len(key), len(ne))) END
             |  )::BIGINT AS dup_len FROM nb WHERE side = 0),
             |m AS (SELECT doc_id, pos, dup_len,
             |    lag(dup_len) OVER (PARTITION BY doc_id ORDER BY pos) AS prev_len FROM d)
             |SELECT doc_id, pos, dup_len AS len FROM m
             |WHERE dup_len >= 12 AND (prev_len IS NULL OR prev_len < dup_len + 1)
             |ORDER BY doc_id, pos""".stripMargin)),

    // INCREMENTAL decontamination — the d16/d15 store discipline applied
    // to d12: eval suites GROW (a new benchmark ships), and the naive
    // response re-screens a 100 TB corpus against the ENTIRE accumulated
    // eval n-gram set. The persisted store holds (a) the eval 13-gram
    // hash set already screened and (b) the per-doc verdicts it
    // produced; folding a new eval batch costs ONE corpus window pass
    // against ONLY the batch's never-seen hashes (new-batch hashes
    // anti-join the hash store — both frames eval-scaled; the survivor
    // set broadcasts onto the corpus window stream exactly like d12's
    // ev), and the verdict merge is a full-outer at CONTAMINATED-doc
    // grain (the rare set — old hits are never recomputed, the corpus
    // never shuffles). Verdicts compose exactly because the hash sets
    // partition the hits: n_hits adds, first_pos takes least(). A
    // re-shipped eval batch folds to a no-op (every hash already
    // stored → empty delta → zero corpus work — DecontaminateSpec's
    // idempotence claim). The gate splits d12's eval half (doc_id%10=7)
    // into stored (%20=7) + new (%20=17) batches and must hash-equal
    // d12's from-scratch recompute over the full split — incremental ≡
    // full, the d12/d32 edge of the triangle whose c12/c15 analogue the
    // streaming rows pin.
    Q("d32_incremental_decontam",
      "fold a NEW eval batch (doc_id%20=17) into the persisted decontamination store: only never-seen eval hashes rescan the corpus, verdicts merge at hit grain — hash-equal to d12's from-scratch recompute",
      (s, d) => {
        val p = decontStorePath(s, d)
        decontaminateIncrement(
          docs(s, d).filter(col("doc_id") % 10 =!= 7),
          s.read.parquet(p + "/eval_hashes"),
          s.read.parquet(p + "/verdicts"),
          docs(s, d).filter(col("doc_id") % 20 === 17))
      },
      // d12's oracle VERBATIM: the full-split recompute is the spec of
      // what the incremental fold must equal
      Some("""WITH n AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm FROM documents),
             |tk AS (SELECT doc_id, list_filter(string_split(norm, ' '), t -> t <> '') AS toks FROM n),
             |w AS (SELECT doc_id, toks, unnest(range(1, len(toks) - 11)) AS p
             |  FROM tk WHERE len(toks) >= 13),
             |h AS (SELECT doc_id, (p - 1)::BIGINT AS pos,
             |    ('0x' || substr(md5(array_to_string(toks[p:p+12], ' ')), 1, 15))::BIGINT AS span_hash
             |  FROM w),
             |ev AS (SELECT DISTINCT span_hash FROM h WHERE doc_id % 10 = 7)
             |SELECT doc_id, count(*)::BIGINT AS n_hits, min(pos) AS first_pos
             |FROM h JOIN ev USING (span_hash)
             |WHERE doc_id % 10 <> 7
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // CRAWL-FRONTIER dedup — t46's canonical form used as the key of an
    // incremental seen-URL store, the d16 discipline applied to the
    // fetch queue: yesterday's canons persist as a sidecar (built once
    // per JVM — production appends per crawl round), today's batch
    // canonicalizes its extracted URLs and flags which are NEW fetches.
    // Scale shape is d16's verbatim: the batch's distinct canons
    // BROADCAST left-semi onto the store scan (the store — billions of
    // URLs at 100 TB — is scanned once, never shuffled or broadcast;
    // plan-asserted), the ≤|batch| survivors join back broadcast. The
    // oracle recomputes store membership from first principles through
    // the SAME canonicalization CTE chain t46's gate runs
    // (TextAnalysis.sqlUrlCanon — one shared text, so the frontier can
    // never disagree with the extractor on what a canonical URL is).
    Q("d33_url_frontier",
      "today's URLs (odd doc_id) against the persisted canonical-URL frontier store: unseen forms flagged as new fetches, store scanned once",
      (s, d) => urlFrontier(s, d, urlStorePath(s, d)),
      Some(s"""WITH a AS (SELECT doc_id, text FROM documents
             |  UNION ALL SELECT doc_id, text FROM read_csv(
             |    '${TextAnalysis.urlFixturePath}', delim='\\t', header=true,
             |    columns={'doc_id': 'BIGINT', 'text': 'VARCHAR'})),
             |${TextAnalysis.sqlUrlCanon},
             |st AS (SELECT DISTINCT canon FROM dm WHERE doc_id % 2 = 0),
             |b AS (SELECT canon, min(domain) AS domain,
             |    count(*)::BIGINT AS n_refs
             |  FROM dm WHERE doc_id % 2 = 1 GROUP BY canon)
             |SELECT b.canon, b.domain, b.n_refs,
             |  (st.canon IS NULL) AS is_new
             |FROM b LEFT JOIN st ON b.canon = st.canon
             |ORDER BY b.canon""".stripMargin)),

    // SCHEMA EVOLUTION on a warehouse store — the other half of the
    // lakehouse table contract the d15/d16 sidecar family assumes away:
    // a long-lived store's INGEST changes over time (here: it starts
    // stamping src_gen on every row), and the accumulated files then
    // span generations — legacy files without the column, new files
    // with it. The supported evolution class is ADD-NULLABLE-ONLY
    // (Delta/Iceberg's safe default; renames and type changes are a
    // rewrite, not an evolution): the consumer reads ALL generations as
    // ONE multi-path relation under the EVOLVED schema — parquet files
    // lacking a requested column yield null for it, no rewrite of TBs
    // of legacy files ever happens — and COALESCES the null to the
    // documented legacy default (src_gen 1). The other direction is the
    // store contract d15 already states ("select the columns you own"):
    // an un-upgraded consumer projecting only the legacy columns never
    // sees the new one. IncrementalStoreSpec pins both directions and
    // that the d16 consumer runs unchanged over the mixed store. 100
    // TB: evolution costs zero I/O at migration time — only readers'
    // resolved schemas change; the gate's hash proves the mixed read
    // is exact, not best-effort.
    Q("d34_store_evolution",
      "mixed-generation hash store read through the evolved schema: legacy files' src_gen nulls coalesce to the documented default, hash-equal to the per-generation rebuild",
      (s, d) => {
        val p = evoStorePath(s, d)
        import org.apache.spark.sql.types._
        val evolved = StructType(Seq(
          StructField("content_hash", StringType),
          StructField("stored_canonical", LongType),
          StructField("src_gen", LongType)))
        s.read.schema(evolved).parquet(s"$p/gen1", s"$p/gen2")
          .select(col("content_hash"), col("stored_canonical"),
            coalesce(col("src_gen"), lit(1L)).as("store_gen"))
          .orderBy("content_hash")
      },
      Some("""WITH h AS (SELECT doc_id,
             |    md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS content_hash
             |  FROM documents),
             |g1 AS (SELECT content_hash, min(doc_id) AS stored_canonical
             |  FROM h WHERE doc_id % 5 IN (0, 1) GROUP BY 1),
             |g2 AS (SELECT content_hash, min(doc_id) AS stored_canonical
             |  FROM h WHERE doc_id % 5 IN (2, 3)
             |    AND content_hash NOT IN (SELECT content_hash FROM g1)
             |  GROUP BY 1)
             |SELECT content_hash, stored_canonical, 1::BIGINT AS store_gen FROM g1
             |UNION ALL
             |SELECT content_hash, stored_canonical, 2::BIGINT AS store_gen FROM g2
             |ORDER BY content_hash""".stripMargin)),

    // ERASURE for the dedup canonical store — the GDPR path the
    // centroid family already has (s29's decrementable sums) applied
    // to the one sidecar whose statistic is NOT decrementable: min().
    // A (hash, canonical) row cannot "subtract" an erased member — if
    // the canonical ITSELF is erased, the next-min member is simply
    // not in the row. The fix is the member-grain sidecar: alongside
    // the d16 canonical table the store keeps (content_hash, doc_id)
    // MEMBER segments, and erasure re-canonicalizes ONLY the affected
    // hashes: the tombstone ids (broadcast) semi-join the member scan
    // to name their hashes (≤ |tombstones| of them), untouched
    // canonical rows CARRY FORWARD from the d16 table without touching
    // their member rows, affected hashes re-resolve min() over their
    // surviving members, and a hash whose members are ALL erased
    // leaves the store. 100 TB: both stores scan once, every join is
    // tombstone-bounded and broadcast, and the rewrite is O(affected
    // hashes) — never a corpus or store re-aggregation; the oracle is
    // the full rebuild over survivors, so the gate proves
    // affected-only maintenance ≡ from-scratch, the same
    // continuous-vs-rebuild contract as s29/c22.
    Q("d35_canonical_erasure",
      "tombstoned docs (stored, doc_id%7=2) leave the member store; affected hashes re-canonicalize from surviving members — hash-equal to the rebuild over survivors",
      (s, d) => memberErase(s,
        memberStorePath(s, d), hashStorePath(s, d),
        docs(s, d).filter(col("doc_id") % 5 =!= 4 &&
          col("doc_id") % 7 === 2).select("doc_id")),
      Some("""WITH h AS (SELECT doc_id,
             |    md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS content_hash
             |  FROM documents),
             |surv AS (SELECT * FROM h
             |  WHERE doc_id % 5 <> 4 AND doc_id % 7 <> 2)
             |SELECT content_hash, min(doc_id) AS canonical_id
             |FROM surv GROUP BY 1 ORDER BY content_hash""".stripMargin))
  )

  /** (doc_id, text) over corpus ∪ the URL fixture battery — the t46/d33
    * shared input frame.
    */
  private def urlDocs(s: SparkSession, d: String): DataFrame =
    docs(s, d).select(col("doc_id"), col("text")).unionByName(
      s.read.option("sep", "\t").option("header", "true")
        .schema("doc_id LONG, text STRING")
        .csv(TextAnalysis.urlFixturePath))

  /** The d33 consumer over an arbitrary frontier store path — public to
    * the package so the DocumentStreamsSpec evolution test can point it
    * at a [[graft.streaming.DocumentStreams.frontierIngest]]-streamed
    * store (one `batch_id=` subdir per micro-batch; the left-semi probe
    * is set-semantics, so duplicate canons across subdirs are harmless).
    */
  private[graft] def urlFrontier(s: SparkSession, d: String,
      storePath: String): DataFrame = {
    val store = s.read.parquet(storePath).select(col("canon"))
    val batch = TextAnalysis.urlCanonical(
        urlDocs(s, d).filter(col("doc_id") % 2 === 1))
      .groupBy("canon", "domain").agg(count(lit(1)).as("n_refs"))
      .localCheckpoint(true)
    val seen = store
      .join(broadcast(batch.select("canon").distinct()),
        Seq("canon"), "left_semi")
      .withColumn("is_seen", lit(true))
      // a multi-batch store holds the same canon once per subdir that
      // saw it; the flag join needs one row per canon
      .distinct()
    batch.join(broadcast(seen), Seq("canon"), "left")
      .select(col("canon"), col("domain"), col("n_refs"),
        not(coalesce(col("is_seen"), lit(false))).as("is_new"))
      .orderBy("canon")
  }

  /** The frontier sidecar: every canonical URL the even-doc_id half ever
    * referenced — one row per DISTINCT canon (StoreFixture discipline:
    * built once per JVM, the gated query times the consumer; production
    * appends one delta per crawl round).
    */
  private def urlStorePath(s: SparkSession, d: String): String =
    graft.core.StoreFixture("graft_urlstore", d) { p =>
      TextAnalysis.urlCanonical(urlDocs(s, d).filter(col("doc_id") % 2 === 0))
        .select("canon").distinct()
        .write.mode("overwrite").parquet(p)
    }

  /** The d29 geometry sweep: (bands, rows-per-band, S-curve midpoint
    * (1/b)^(1/r)) — all divisors of the 30-perm signature. Midpoints are
    * computed ONCE here and interpolated as identical literals into both
    * engines' plans, so the float never has to agree across pow()
    * implementations.
    */
  // lazy: declared below `registry`, which interpolates it at object init
  private lazy val LshGeometries: Seq[(Int, Int, Double)] =
    Seq(30 -> 1, 15 -> 2, 10 -> 3, 6 -> 5).map { case (nb, r) =>
      (nb, r, math.pow(1.0 / nb, 1.0 / r))
    }

  /** One-sided prefix-filtered containment join over an arbitrary
    * (doc_id, text) frame — d22's engine, public like [[decontaminate]]
    * so any corpus (or corpus-vs-reference pair study) can run it.
    * Returns every ordered pair (doc_a contained-in doc_b) with
    * c = |A∩B| / |A| >= t.
    */
  def containmentJoin(docFrame: DataFrame, t: Double): DataFrame = {
    val ex = explodedShinglesOf(docFrame).localCheckpoint(true)
    val dfCounts = ex.groupBy("shingle").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("df").asc, col("shingle").asc)
    val prefix = ex.join(dfCounts.hint("shuffle_hash"), Seq("shingle"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= col("nsh") - ceil(col("nsh") * t) + 1)
      .select(col("doc_id").as("doc_a"), col("nsh").as("size_a"),
        col("shingle"))
    val full = ex.select(col("doc_id").as("doc_b"),
      col("nsh").as("size_b"), col("shingle"))
    // NOT checkpointed: the union in restrictToCandidateDocs does re-run
    // this join once per projection, but the re-run reads ReusedExchange
    // shuffles (measured ~4% of the query at sf0.1 — within load noise),
    // and materializing the pair set would hide the candidate phase from
    // the executed plan the PlanShapeSpec gate audits
    val cand = prefix.hint("merge").join(full, Seq("shingle"))
      .filter(col("doc_a") =!= col("doc_b") &&
        col("size_b") >= col("size_a") * t)
      .select(col("doc_a"), col("doc_b"))
    containmentPairs(restrictToCandidateDocs(ex, cand), t)
      .orderBy("doc_a", "doc_b")
  }

  /** Exact ordered-pair containment over an exploded-shingle frame:
    * c(a,b) = |a∩b| / |a| for every a ≠ b sharing a shingle. Same
    * inverted-index join + merge-hint shape as [[jaccardPairs]] (one
    * reused ENSURE_REQUIREMENTS exchange, AQE-skew-splittable, never a
    * static broadcast of the misestimated exploded frame); differs in
    * keeping BOTH orientations — containment is asymmetric, and a
    * near-equal-size pair can qualify in both directions.
    */
  private def containmentPairs(ex: DataFrame, threshold: Double): DataFrame = {
    val a = ex.select(col("doc_id").as("doc_a"), col("nsh").as("size_a"), col("shingle"))
    val b = ex.select(col("doc_id").as("doc_b"), col("nsh").as("size_b"), col("shingle"))
    a.hint("merge").join(b, Seq("shingle"))
      .filter(col("doc_a") =!= col("doc_b"))
      .groupBy("doc_a", "doc_b", "size_a", "size_b")
      .agg(count(lit(1)).as("intersection"))
      .withColumn("containment",
        col("intersection") * lit(1.0) / col("size_a"))
      .filter(col("containment") >= threshold)
      .select(col("doc_a"), col("doc_b"),
        col("size_a").cast("long"), col("size_b").cast("long"),
        col("intersection"), col("containment"))
  }

  /** Broadcast-semi restriction of the exploded frame to the docs named by
    * a candidate pair set — the shared head of every lossless-candidate
    * verification (the candidate set is ~|true pairs|, orders of magnitude
    * under the corpus).
    */
  private def restrictToCandidateDocs(ex: DataFrame, cand: DataFrame): DataFrame = {
    val candDocs = cand.select(col("doc_a").as("doc_id"))
      .union(cand.select(col("doc_b").as("doc_id"))).distinct()
    ex.join(broadcast(candDocs), Seq("doc_id"), "left_semi")
  }

  /** DuckDB twin of the d23/d25 containment-estimation pipeline:
    * regenerates signatures, band agreement, and the both-orientation
    * containment algebra from the same md5-derived permutations.
    * `candPred` restricts the candidate pair space (d25's
    * at-least-one-new rule); "" gates the full frame (d23).
    */
  private def sqlContainmentEstimate(candPred: String): String = {
    val aList = MinHashCoeffs.map(_._1).mkString("[", ",", "]")
    val bList = MinHashCoeffs.map(_._2).mkString("[", ",", "]")
    s"""$sqlShingled,
       |hs AS (SELECT doc_id,
       |    list_transform(sh, g0 -> ('0x' || substr(md5(g0), 1, 15))::BIGINT % 2147483647) AS gs
       |  FROM sh),
       |sig AS (SELECT doc_id, list_transform(range(0, 30), k ->
       |      list_aggregate(list_transform(gs,
       |        g -> (g * ($aList)[k+1] + ($bList)[k+1]) % 2147483647), 'min')) AS sig
       |  FROM hs),
       |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sig AS sa, b.sig AS sb
       |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       |  WHERE $candPred len(list_filter(range(0, 10), j ->
       |    a.sig[3*j+1] = b.sig[3*j+1] AND a.sig[3*j+2] = b.sig[3*j+2]
       |      AND a.sig[3*j+3] = b.sig[3*j+3])) > 0),
       |est AS (SELECT doc_a, doc_b,
       |    len(list_filter(range(0, 30), k -> sa[k+1] = sb[k+1]))::BIGINT AS est_matches
       |  FROM cand),
       |j AS (SELECT e.doc_a, e.doc_b, a.nsh AS size_a, b.nsh AS size_b,
       |    e.est_matches, e.est_matches * 1.0 / 30 AS est_j
       |  FROM est e JOIN sh a ON e.doc_a = a.doc_id
       |    JOIN sh b ON e.doc_b = b.doc_id)
       |SELECT doc_a, doc_b, size_a::BIGINT AS size_a, size_b::BIGINT AS size_b,
       |  est_matches,
       |  est_j / (1.0 + est_j) * (size_a + size_b) / size_a AS est_c_a_in_b,
       |  est_j / (1.0 + est_j) * (size_a + size_b) / size_b AS est_c_b_in_a
       |FROM j
       |WHERE greatest(est_j / (1.0 + est_j) * (size_a + size_b) / size_a,
       |  est_j / (1.0 + est_j) * (size_a + size_b) / size_b) >= 0.85
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** Exact all-ordered-pairs containment SQL (the d22 oracle). */
  private def sqlExactContainment(threshold: Double): String =
    s"""$sqlShingled,
       |ex AS (SELECT doc_id, nsh, unnest(sh) AS shingle FROM sh),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    a.nsh AS size_a, b.nsh AS size_b, count(*)::BIGINT AS intersection
       |  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
       |  GROUP BY 1, 2, 3, 4)
       |SELECT doc_a, doc_b, size_a::BIGINT AS size_a, size_b::BIGINT AS size_b,
       |  intersection,
       |  intersection * 1.0 / size_a AS containment
       |FROM pairs
       |WHERE intersection * 1.0 / size_a >= $threshold
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Converged near-dup component labels (doc_id, canonical_id) of an
    * arbitrary (doc_id, text) frame — the full d09 pipeline (exact
    * Jaccard ≥ 0.5 pairs → large/small-star CC), factored out so the
    * d19 label STORE build, the incremental evolution spec, and any
    * caller canonicalizing a fresh corpus all derive labels from the
    * same code path. Covers only docs that appear in a qualifying pair
    * (the duplicated minority), like d09.
    */
  private[graft] def corpusLabels(docFrame: DataFrame): DataFrame =
    connectedComponents(
      jaccardPairs(explodedShinglesOf(docFrame).localCheckpoint(true), 0.5)
        .select(col("doc_a"), col("doc_b")))
      .withColumnRenamed("node", "doc_id")
      .withColumnRenamed("label", "canonical_id")

  /** The d19 warehouse sidecar — the converged (doc_id, canonical_id)
    * component labels, persisted ONCE per JVM (StoreFixture discipline:
    * the gated consumer times the argmax leg, not the amortized CC
    * build; production maintains the store incrementally via
    * [[incrementalLabelsOf]] as batches arrive). The last
    * recompute-not-reuse seam of the registry: before round 10, d19
    * re-ran the whole d09 loop inline on every invocation.
    */
  private def labelStorePath(s: SparkSession, d: String): String =
    graft.core.StoreFixture("graft_labelstore", d) { p =>
      corpusLabels(docs(s, d)).write.mode("overwrite").parquet(p)
    }

  /** Incremental label maintenance — the d15/d16 mold applied to the
    * component store: fold a new batch's near-dup PAIRS into persisted
    * labels without re-clustering the corpus. The stored labels are a
    * star forest (every doc points at its component's min id), so each
    * touched component is fully described by its star edges; the
    * re-convergence input is those edges UNION the batch pairs — bounded
    * by the TOUCHED components plus the batch, never the corpus. Docs in
    * untouched components pass through unchanged.
    *
    * Equality with a full rebuild (the fold≡rebuild discipline,
    * spec-pinned): a batch edge can only change components it reaches;
    * every reachable old component contributes its complete membership
    * via its star edges, so the min-id relabel over (star ∪ batch) is
    * exactly the full rebuild's answer on those components. Canonicals
    * are monotone non-increasing under new batches (min over a superset)
    * — an already-assigned doc's canonical NEVER changes unless a batch
    * genuinely bridges its component to a lower-id one.
    *
    * Plan shape (rule 4): the store enters as a SCAN on both legs; the
    * batch-derived node/label sets broadcast onto it (left-semi/anti);
    * the CC loop runs on the touched-subgraph edges only.
    */
  private[graft] def incrementalLabelsOf(batchPairs: DataFrame,
      storePath: String): DataFrame = {
    val s = batchPairs.sparkSession
    val stored = s.read.parquet(storePath)
      .select(col("doc_id"), col("canonical_id"))
    val batchNodes = batchPairs.select(col("doc_a").as("doc_id"))
      .union(batchPairs.select(col("doc_b").as("doc_id"))).distinct()
      .localCheckpoint(true)
    // components the batch touches: canonicals of any stored doc named
    // by a batch pair (both sets are batch-bounded — they broadcast)
    val touched = stored
      .join(broadcast(batchNodes), Seq("doc_id"), "left_semi")
      .select(col("canonical_id")).distinct()
      .localCheckpoint(true)
    val touchedStar = stored
      .join(broadcast(touched), Seq("canonical_id"), "left_semi")
    val edges = batchPairs.select(col("doc_a"), col("doc_b"))
      .union(touchedStar
        .filter(col("doc_id") =!= col("canonical_id"))
        .select(col("doc_id").as("doc_a"), col("canonical_id").as("doc_b")))
    val relabeled = connectedComponents(edges)
      .withColumnRenamed("node", "doc_id")
      .withColumnRenamed("label", "canonical_id")
    stored
      .join(broadcast(touched), Seq("canonical_id"), "left_anti")
      .select(col("doc_id"), col("canonical_id"))
      .unionByName(relabeled)
  }

  /** The d16/d18 warehouse sidecar — one (content_hash, stored_canonical)
    * row per distinct document ever seen outside the gate batch — built
    * from the input tables ONCE per JVM (StoreFixture: per-process path,
    * no cross-process races) so the gated queries time the consumer
    * only; production appends per batch (streaming: hashIngest).
    */
  private def hashStorePath(s: SparkSession, d: String): String =
    graft.core.StoreFixture("graft_hashstore", d) { p =>
      contentHashes(docs(s, d).filter(!(col("doc_id") % 5 === 4)))
        .groupBy("content_hash").agg(min(col("doc_id")).as("stored_canonical"))
        .write.mode("overwrite").parquet(p)
    }

  /** The d32 decontamination sidecar — the eval 13-gram hash set already
    * screened (stored batch: doc_id%20=7) plus the per-doc verdicts that
    * screen produced, built ONCE per JVM (StoreFixture discipline;
    * production appends one hash-set + verdict delta per eval release).
    * Two sub-tables under one store root: consumers select the table
    * they own.
    */
  private def decontStorePath(s: SparkSession, d: String): String =
    graft.core.StoreFixture("graft_decontstore", d) { p =>
      val all = docs(s, d)
      val evalA = all.filter(col("doc_id") % 20 === 7)
      positionalWindowsOf(evalA, 13).select(col("span_hash")).distinct()
        .write.mode("overwrite").parquet(p + "/eval_hashes")
      decontaminate(all.filter(col("doc_id") % 10 =!= 7), evalA)
        .write.mode("overwrite").parquet(p + "/verdicts")
    }

  /** The d15/d25 warehouse sidecar — 30-perm signature + exact set size
    * per document outside the gate batch, built ONCE per JVM
    * (StoreFixture discipline; production maintains it per batch via
    * the streaming signatureIngest, which writes the same sized
    * schema). ONE physical sidecar serves both consumers: d15 reads the
    * signature columns (symmetric near-dup estimates), d25 additionally
    * reads `nsh` (containment screening) — the store contract is
    * "select the columns you own", so producers may append bookkeeping
    * columns without breaking either.
    */
  private def sigStorePath(s: SparkSession, d: String): String =
    graft.core.StoreFixture("graft_sigstore", d) { p =>
      minhashSigsSized(explodedShinglesOf(
        docs(s, d).filter(!(col("doc_id") % 5 === 4))))
        .write.mode("overwrite").parquet(p)
    }

  /** The d35 MEMBER-GRAIN erasure sidecar — (content_hash, doc_id) for
    * every stored document (doc_id % 5 ≠ 4), the segment family that
    * makes the min()-canonical store erasable: the canonical table
    * alone cannot re-resolve a deleted canonical (min is not
    * decrementable — the ForgetSpec finding); the member rows can.
    * Production appends one segment per ingest batch alongside each
    * d16 canonical append.
    */
  private def memberStorePath(s: SparkSession, d: String): String =
    graft.core.StoreFixture("graft_memberstore", d) { p =>
      contentHashes(docs(s, d).filter(!(col("doc_id") % 5 === 4)))
        .select("content_hash", "doc_id")
        .write.mode("overwrite").parquet(p)
    }

  /** The d35 erasure fold: re-canonicalize ONLY the hashes a tombstone
    * batch touches. `gone` is the tombstoned doc_id set (broadcast —
    * erasure batches are small); `memberPath` the member segments,
    * `canonicalPath` the d16 (hash, canonical) table. Untouched hashes
    * carry their canonical rows forward untouched; affected hashes
    * re-resolve min() over surviving members; fully-erased hashes drop.
    * Both stores scan exactly once; nothing store-sized ever shuffles
    * or broadcasts.
    */
  private[graft] def memberErase(s: SparkSession, memberPath: String,
      canonicalPath: String, gone: DataFrame): DataFrame = {
    val members = s.read.parquet(memberPath)
      .select(col("content_hash"), col("doc_id"))
    val canonical = s.read.parquet(canonicalPath)
      .select(col("content_hash"),
        col("stored_canonical").as("canonical_id"))
    val goneIds = gone.select("doc_id").distinct().localCheckpoint(true)
    // the hashes the batch touches — resolved FROM the member scan by
    // broadcast semi-join, ≤ |tombstones| rows
    val affected = members
      .join(broadcast(goneIds), Seq("doc_id"), "left_semi")
      .select("content_hash").distinct().localCheckpoint(true)
    val untouched = canonical
      .join(broadcast(affected), Seq("content_hash"), "left_anti")
    // affected hashes: min over surviving members (empty → drops out)
    val reresolved = members
      .join(broadcast(affected), Seq("content_hash"), "left_semi")
      .join(broadcast(goneIds), Seq("doc_id"), "left_anti")
      .groupBy("content_hash")
      .agg(min(col("doc_id")).as("canonical_id"))
    untouched.unionByName(reresolved).orderBy("content_hash")
  }

  /** The d34 MIXED-GENERATION hash store — the schema-evolution
    * fixture. Generation 1 (docs with doc_id % 5 ∈ {0, 1}) is written
    * in the LEGACY two-column schema; generation 2 (doc_id % 5 ∈
    * {2, 3}, hashes not already stored — the drop-in append
    * discipline) by an ingest that has since evolved to stamp
    * `src_gen`. Legacy files are NEVER rewritten — the evolution is
    * entirely in the reader's resolved schema (add-nullable-only;
    * consumer coalesces null → 1, the documented legacy default).
    */
  private def evoStorePath(s: SparkSession, d: String): String =
    graft.core.StoreFixture("graft_evostore", d) { p =>
      val g1 = contentHashes(docs(s, d)
          .filter(col("doc_id") % 5 === 0 || col("doc_id") % 5 === 1))
        .groupBy("content_hash")
        .agg(min(col("doc_id")).as("stored_canonical"))
        .localCheckpoint(true)
      g1.write.mode("overwrite").parquet(s"$p/gen1")
      contentHashes(docs(s, d)
          .filter(col("doc_id") % 5 === 2 || col("doc_id") % 5 === 3))
        .groupBy("content_hash")
        .agg(min(col("doc_id")).as("stored_canonical"))
        .join(g1.select("content_hash"), Seq("content_hash"), "left_anti")
        .withColumn("src_gen", lit(2L))
        .write.mode("overwrite").parquet(s"$p/gen2")
    }

  /** The d18 bloom sidecar — the hash store's keys folded once into the
    * 4096-bit/3-hash position set (in production: ingest ORs each
    * batch's positions in as it appends the store — bloomIngest).
    */
  private def bloomStorePath(s: SparkSession, d: String): String =
    graft.core.StoreFixture("graft_bloomstore", d) { p =>
      s.read.parquet(hashStorePath(s, d))
        .select(explode(bloomPositions(col("content_hash"))).as("bit_pos"))
        .distinct()
        .write.mode("overwrite").parquet(p)
    }

  /** Force-build every Dedup warehouse sidecar (label/hash/sig/bloom)
    * for input `d`. Bench calls this during warmup so a best-of-1
    * sweep times each gated CONSUMER leg, never the once-per-JVM store
    * build — the StoreFixture discipline the gates document. Without
    * it the r11 sf1 decade sweep (best-of-1) charged the full d09 CC
    * build to d19's single measurement: 12.8 s vs sub-second warm.
    */
  private[graft] def warmStores(s: SparkSession, d: String): Unit = {
    labelStorePath(s, d); hashStorePath(s, d)
    sigStorePath(s, d); bloomStorePath(s, d); evoStorePath(s, d)
    memberStorePath(s, d); ()
  }

  /** The k = 3 bloom bit positions of a content-hash key, md5-derived so
    * the oracle regenerates them (`('0x' || substr(md5('bloom' || j ||
    * '_' || h), 1, 15))::BIGINT % 4096`). m = 4096 bits. Shared by the
    * d18 consumer, the gate's sidecar build, and the streaming
    * [[graft.streaming.DocumentStreams.bloomIngest]] producer, so every
    * producer/consumer pairing derives identical bits.
    */
  private[graft] def bloomPositions(hash: Column): Column =
    array((0 until 3).map(j =>
      h60(concat(lit(s"bloom${j}_"), hash)) % 4096L): _*)

  /** The d18 consumer, over an arbitrary (doc_id, text) batch frame and
    * any producer's bloom/store sidecars — the form the streaming
    * integration and multi-batch evolution specs drive. The bit
    * positions are DISTINCT'd at read (≤ m rows either way): a
    * multi-batch producer appends one subdir per micro-batch, so a
    * position set twice by different batches holds two rows — without
    * the dedup the probe join would fan out and `n_hit = k` would read
    * a PRESENT key as absent (a false negative, the one error class a
    * bloom filter must never commit).
    */
  private[graft] def bloomPrefilterOf(batchDocs: DataFrame,
      bloomPath: String, storePath: String): DataFrame = {
    val s = batchDocs.sparkSession
    val bits = s.read.parquet(bloomPath).select("bit_pos").distinct()
    val probe = contentHashes(batchDocs.select("doc_id", "text"))
      .localCheckpoint(true)
    // k probe rows per doc against the broadcast bit set; the count
    // of matched positions folds map-side (batch-bound groupBy)
    val hitCounts = probe
      .select(col("doc_id"), col("content_hash"),
        explode(bloomPositions(col("content_hash"))).as("bit_pos"))
      .join(broadcast(bits.withColumn("present", lit(1))),
        Seq("bit_pos"), "left")
      .groupBy("doc_id", "content_hash")
      .agg(count(col("present")).as("n_hit"))
      .withColumn("bloom_hit", col("n_hit") === 3)
    // the store is scanned ONLY for bloom-positive hashes (the
    // operator's point): positives broadcast left-semi onto the scan
    val positives = hitCounts.filter(col("bloom_hit"))
      .select("content_hash").distinct()
    val known = s.read.parquet(storePath)
      .join(broadcast(positives), Seq("content_hash"), "left_semi")
      .select(col("content_hash")).distinct()
      .withColumn("is_known", lit(true))
    hitCounts
      .join(broadcast(known), Seq("content_hash"), "left")
      .select(col("doc_id"), col("content_hash"), col("bloom_hit"),
        coalesce(col("is_known"), lit(false)).as("is_known"))
      // no false negatives: ¬bloom_hit ⇒ ¬is_known, so the non-
      // probed hashes' is_known=false is exact, not an approximation
      .withColumn("false_positive", col("bloom_hit") && !col("is_known"))
      .orderBy("doc_id")
  }

  /** The d15 consumer, parameterized by the signature-store path so ANY
    * producer of the store — the gate's batch rebuild, or the streaming
    * [[graft.streaming.DocumentStreams.signatureIngest]] — feeds the
    * same dedup. Reads exactly the signature columns (producers may add
    * bookkeeping columns like the ingest's batch_id partition; they are
    * not the store's contract), shingles ONLY the new batch, and
    * estimates (new × all) band-agreement candidates from signatures
    * alone.
    */
  private[graft] def incrementalNearDup(s: SparkSession, d: String,
      storePath: String): DataFrame =
    incrementalNearDupOf(docs(s, d).filter(col("doc_id") % 5 === 4),
      storePath)

  /** [[incrementalNearDup]] over an arbitrary (doc_id, text) batch frame
    * — the form the multi-batch evolution specs drive: batch N dedups
    * against the store, appends its own signatures, batch N+1 dedups
    * against the grown store.
    */
  private[graft] def incrementalNearDupOf(batchDocs: DataFrame,
      storePath: String): DataFrame = {
    val s = batchDocs.sparkSession
    val sigCols = col("doc_id") +: (0 until 30).map(k => col(s"mh_$k"))
    val fresh = minhashSigs(explodedShinglesOf(
      batchDocs.select("doc_id", "text")))
      .localCheckpoint(true)
    // "works with ANY producer" means tolerating a store that already
    // contains some of this batch's doc_ids (an ingest that ran ahead of
    // the dedup pass): anti-join those out so a re-ingested doc's
    // signature is never duplicated into the pair estimates. The batch
    // id-list broadcasts (it is the small side); the store side stays a
    // streamed scan, preserving the store-never-shuffles plan shape.
    val stored = s.read.parquet(storePath).select(sigCols: _*)
      .join(broadcast(fresh.select("doc_id")), Seq("doc_id"), "left_anti")
    val all = stored.unionByName(fresh)
    val nb = bandRows(fresh)
    val ab = bandRows(all)
    // the batch's band rows broadcast EXPLICITLY (10 rows/doc of one
    // daily batch) so the store's band rows stream — relying on a size
    // estimate here would shuffle the store the day the estimate is off
    val cand = broadcast(nb.as("x")).join(ab.as("y"), Seq("bkey"))
      .filter(col("x.doc_id") =!= col("y.doc_id") &&
        col("x.m0") === col("y.m0") && col("x.m1") === col("y.m1") &&
        col("x.m2") === col("y.m2"))
      .select(least(col("x.doc_id"), col("y.doc_id")).as("doc_a"),
        greatest(col("x.doc_id"), col("y.doc_id")).as("doc_b"))
      .distinct()
    signatureEstimates(cand, all, broadcastCand = true)
      .orderBy("doc_a", "doc_b")
  }

  /** The d25 consumer, parameterized by the signature+size-store path so
    * ANY producer — the gate's batch rebuild ([[minhashSigsSized]]) or
    * the streaming signatureIngest — feeds the same containment screen.
    */
  private[graft] def incrementalContainment(s: SparkSession, d: String,
      storePath: String): DataFrame =
    incrementalContainmentOf(docs(s, d).filter(col("doc_id") % 5 === 4),
      storePath)

  /** [[incrementalContainment]] over an arbitrary (doc_id, text) batch
    * frame — the multi-batch evolution form (see
    * [[incrementalNearDupOf]], whose candidate discipline this shares:
    * batch band rows broadcast, store band rows stream, candidates are
    * (new × all) so a batch with internal containments still screens
    * itself). The verdict stage is d23's containment algebra over the
    * attached signatures and EXACT set sizes — both carried by the
    * store, so the corpus text is never re-read for the stored side.
    */
  private[graft] def incrementalContainmentOf(batchDocs: DataFrame,
      storePath: String, minEst: Double = 0.85): DataFrame = {
    val s = batchDocs.sparkSession
    val sizedCols = col("doc_id") +:
      ((0 until 30).map(k => col(s"mh_$k")) :+ col("nsh"))
    val fresh = minhashSigsSized(explodedShinglesOf(
      batchDocs.select("doc_id", "text")))
      .localCheckpoint(true)
    val stored = s.read.parquet(storePath).select(sizedCols: _*)
      .join(broadcast(fresh.select("doc_id")), Seq("doc_id"), "left_anti")
    val all = stored.unionByName(fresh)
    val nb = bandRows(fresh)
    val ab = bandRows(all)
    val cand = broadcast(nb.as("x")).join(ab.as("y"), Seq("bkey"))
      .filter(col("x.doc_id") =!= col("y.doc_id") &&
        col("x.m0") === col("y.m0") && col("x.m1") === col("y.m1") &&
        col("x.m2") === col("y.m2"))
      .select(least(col("x.doc_id"), col("y.doc_id")).as("doc_a"),
        greatest(col("x.doc_id"), col("y.doc_id")).as("doc_b"))
      .distinct()
    // attach signature AND size in one pass per side (the
    // signatureAttach broadcastCand shape, with nsh riding along): the
    // pair-bound candidate set broadcasts, the store-backed side
    // streams through both attaches exchange-free
    val aSide = all.select(col("doc_id").as("doc_a") +:
      ((0 until 30).map(k => col(s"mh_$k").as(s"a_$k")) :+
        col("nsh").as("size_a")): _*)
    val bSide = all.select(col("doc_id").as("doc_b") +:
      ((0 until 30).map(k => col(s"mh_$k").as(s"b_$k")) :+
        col("nsh").as("size_b")): _*)
    val matches = (0 until 30).map(k =>
      when(col(s"a_$k") === col(s"b_$k"), 1L).otherwise(0L)).reduce(_ + _)
    val firstAttach = broadcast(cand).join(aSide, "doc_a")
      .localCheckpoint(true)
    broadcast(firstAttach).join(bSide, "doc_b")
      .withColumn("est_matches", matches)
      .withColumn("est_j", col("est_matches") * lit(1.0) / 30)
      .withColumn("est_c_a_in_b",
        col("est_j") / (lit(1.0) + col("est_j"))
          * (col("size_a") + col("size_b")) / col("size_a"))
      .withColumn("est_c_b_in_a",
        col("est_j") / (lit(1.0) + col("est_j"))
          * (col("size_a") + col("size_b")) / col("size_b"))
      .filter(greatest(col("est_c_a_in_b"), col("est_c_b_in_a")) >= minEst)
      .select(col("doc_a"), col("doc_b"),
        col("size_a").cast("long"), col("size_b").cast("long"),
        col("est_matches"), col("est_c_a_in_b"), col("est_c_b_in_a"))
      .orderBy("doc_a", "doc_b")
  }

  /** (doc_id, content_hash) of a (doc_id, text) frame — the d01/d16
    * exact-dedup key (md5 of the normalized text), shared by the gates,
    * the batch store build, and the streaming
    * [[graft.streaming.DocumentStreams.hashIngest]] producer, so every
    * producer/consumer pairing agrees on the key bit-for-bit.
    */
  private[graft] def contentHashes(docFrame: DataFrame): DataFrame =
    docFrame.select(col("doc_id"), md5(normText(col("text"))).as("content_hash"))

  /** The d16 consumer, parameterized by the content-hash-store path so
    * ANY producer — the gate's batch rebuild, or the streaming
    * [[graft.streaming.DocumentStreams.hashIngest]] — feeds the same
    * incremental exact dedup. Scale shape (the operator's point): the
    * batch's distinct hashes BROADCAST left-semi onto the store scan, so
    * the store — TBs at 100 TB corpus scale — is scanned once and never
    * shuffled or broadcast; everything after the semi-join is ≤ |batch|
    * rows.
    */
  private[graft] def incrementalExact(s: SparkSession, d: String,
      storePath: String): DataFrame =
    incrementalExactOf(docs(s, d).filter(col("doc_id") % 5 === 4),
      storePath)

  /** [[incrementalExact]] over an arbitrary (doc_id, text) batch frame —
    * the multi-batch evolution form (see [[incrementalNearDupOf]]).
    */
  private[graft] def incrementalExactOf(batchDocs: DataFrame,
      storePath: String): DataFrame = {
    val s = batchDocs.sparkSession
    val stored = s.read.parquet(storePath)
      .select(col("content_hash"), col("stored_canonical"))
    val fresh = contentHashes(batchDocs)
      .localCheckpoint(true)
    val hit = stored.join(
        broadcast(fresh.select("content_hash").distinct()),
        Seq("content_hash"), "left_semi")
      // a multi-batch store (the hashIngest producer appends one subdir
      // per micro-batch) holds one row per (hash, batch that saw it);
      // min over the semi-join survivors is the least()-merge on
      // conflict, aggregated AFTER the semi-join so it only ever touches
      // ≤ |batch| rows — the store itself still never shuffles
      .groupBy("content_hash")
      .agg(min(col("stored_canonical")).as("stored_canonical"))
    val batchMin = fresh.groupBy("content_hash")
      .agg(min(col("doc_id")).as("batch_min"))
    fresh.join(batchMin.hint("shuffle_hash"), Seq("content_hash"))
      .join(broadcast(hit), Seq("content_hash"), "left")
      // least() skips NULLs, so a hash absent from the store (null
      // stored_canonical) resolves to the batch minimum directly
      .select(col("doc_id"), col("content_hash"),
        least(col("stored_canonical"), col("batch_min"))
          .as("canonical_id"))
      .withColumn("is_duplicate", col("doc_id") =!= col("canonical_id"))
      .orderBy("doc_id")
  }

  /** DuckDB twin of the d14/d15 signature pipeline: regenerates the
    * 30-perm signatures, band agreement and the Broder estimates from the
    * same md5-derived permutations, so the gates pin the estimates
    * bit-for-bit. `candPred` restricts the candidate pair space (d15's
    * at-least-one-new rule); "" gates the full frame (d14).
    */
  private def minhashEstimateSql(candPred: String): String = {
    val aList = MinHashCoeffs.map(_._1).mkString("[", ",", "]")
    val bList = MinHashCoeffs.map(_._2).mkString("[", ",", "]")
    s"""$sqlShingled,
       |hs AS (SELECT doc_id,
       |    list_transform(sh, g0 -> ('0x' || substr(md5(g0), 1, 15))::BIGINT % 2147483647) AS gs
       |  FROM sh),
       |sig AS (SELECT doc_id, list_transform(range(0, 30), k ->
       |      list_aggregate(list_transform(gs,
       |        g -> (g * ($aList)[k+1] + ($bList)[k+1]) % 2147483647), 'min')) AS sig
       |  FROM hs),
       |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sig AS sa, b.sig AS sb
       |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       |  WHERE ${candPred}len(list_filter(range(0, 10), j ->
       |    a.sig[3*j+1] = b.sig[3*j+1] AND a.sig[3*j+2] = b.sig[3*j+2]
       |      AND a.sig[3*j+3] = b.sig[3*j+3])) > 0),
       |est AS (SELECT doc_a, doc_b,
       |    len(list_filter(range(0, 30), k -> sa[k+1] = sb[k+1]))::BIGINT AS est_matches
       |  FROM cand)
       |SELECT doc_a, doc_b, est_matches, est_matches * 1.0 / 30 AS est_jaccard
       |FROM est WHERE est_matches >= 15 ORDER BY doc_a, doc_b""".stripMargin
  }
}
