package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.core.{Q, Tables}
import graft.functions.Portable._

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (64-dim float vectors), plus the embedding-space dedup that shares
  * its machinery:
  *
  *  - s01: brute-force cosine top-k — the exactness baseline. The query set
  *    is broadcast against the corpus, the dot product is a fused codegen'd
  *    fold (no UDF), and top-k per query is a window row_number whose
  *    partial sort AQE keeps per-partition. Cost is |Q|·|corpus|·dim —
  *    right up to ~10^10 cell ops, after which the indexes take over.
  *  - s02/s05: random-hyperplane LSH, single- and multi-probe — sign
  *    buckets from 8 md5-derived hyperplanes (deterministic, so the
  *    oracle regenerates them); search touches the query's bucket
  *    (~1/256 of the corpus), multi-probe adds the 8 Hamming-1 buckets.
  *  - s03/s08: IVF over exact-decimal coarse centroids, nprobe = 1 / 2
  *    (one parameterized body, [[ivfKnn]]); s04 is the index-build
  *    assignment step.
  *  - s06/s07: product quantization (8×16 codebook, one distributed
  *    Lloyd step, ADC + exact re-rank), alone and composed with IVF
  *    pruning.
  *  - d13: SemDeDup — within-centroid-cluster cosine pairs, the scale
  *    path for d05's brute-force near-dup scan; lives here because it
  *    shares the centroid/assignment machinery.
  *
  * The kNN queries return (query_id, rank, neighbor_id, …) — rank ties
  * broken by neighbor id, cosine computed in double with pinned
  * left-to-right accumulation so the DuckDB oracle reproduces the exact
  * ordering.
  *
  * Query workload is PINNED, not proportional: every retrieval gate's
  * query set is `vec_id % 50 = 0 AND vec_id < 2000` — the id window
  * covers the whole corpus at the gate SFs (sf0.1 tops out at vec_id
  * 1999, so the window changes nothing there) and FREEZES the query
  * count as the corpus scales past it. Without the window the query
  * set grows with the corpus and every corpus×queries retrieval leg
  * turns O(n²/50) — the r11 registry-wide decade sweep caught exactly
  * that shape on the un-windowed m05/m06 twins (sf0.1→sf1 exponents
  * 1.44/1.54). A retrieval system's query rate is workload-determined,
  * independent of corpus size, so fixed-queries-vs-growing-corpus is
  * the scaling question worth measuring — and the 100 TB story (s02:
  * bucket = the vector store's partition key; per-query cost ∝ list
  * size) only holds under it.
  */
object Similarity {

  private[graft] val Dim = 64

  /** Exact per-dimension mean of a vector column per group — order-free
    * AND bit-portable. Each dimension sums as DECIMAL(38,18): exact and
    * commutative, so it partial-aggregates map-side and the result is
    * independent of partition count/order at any executor count, and the
    * aggregation state is `dim` decimals + a count per group — unlike the
    * earlier array_sort(collect_list(struct(...))) + pinned-fold
    * formulation, whose per-group buffer was the cluster's ENTIRE vector
    * set (an executor memory bomb at 100 TB).
    *
    * Portability note: Spark's double→decimal cast goes through the
    * shortest decimal representation (BigDecimal.valueOf), while DuckDB's
    * direct cast multiplies in double and diverges in the 17th digit — the
    * oracle must cast VARCHAR→DECIMAL ([[sqlMeanList]]). Even then the
    * final decimal→double cast can differ by 1 ULP between engines
    * (s09's gate caught it), which is harmless for ARGMIN consumers
    * (s03/s04/s09/d13 rank on the derived cosine; a 1-ULP flip needs a
    * near-exact centroid tie) but means centroid-derived doubles must
    * not appear in hash-gated OUTPUT columns.
    */
  private def exactMeanVec(df: DataFrame, keys: Seq[String], vecCol: String,
      dim: Int, outCol: String): DataFrame = {
    val sums = (1 to dim).map(i =>
      sum(element_at(col(vecCol), i).cast(DecimalType(38, 18))).as(s"_s$i"))
    df.groupBy(keys.map(col): _*)
      .agg(sums.head, (sums.tail :+ count(lit(1)).as("_cnt")): _*)
      .select(keys.map(col) :+
        array((1 to dim).map(i =>
          col(s"_s$i").cast("double") / col("_cnt")): _*).as(outCol): _*)
  }

  /** DuckDB twin of [[exactMeanVec]]: a per-dimension exact-decimal mean
    * list for a GROUP BY (see the portability note there for the VARCHAR
    * hop).
    */
  private def sqlMeanList(vecExpr: String, dim: Int): String =
    (1 to dim).map(i =>
      s"CAST(sum(CAST($vecExpr[$i] AS VARCHAR)::DECIMAL(38,18)) AS DOUBLE) / count(*)")
      .mkString("[", ",\n      ", "]")

  /** Exact per-label coarse centroids (label, cent, cnrm) — the IVF
    * coarse-quantizer table (s03/s04/s07), a k×dim broadcast dim.
    */
  private def coarseCentroids(v: DataFrame, labelCol: String): DataFrame =
    exactMeanVec(v.select(col(labelCol), col("v")), Seq(labelCol), "v", Dim, "cent")
      .withColumn("cnrm", sqrt(dotFast(col("cent"), col("cent"))))

  /** The PERSISTED-index form of [[coarseCentroids]]: per-label centroid
    * PLUS the exact sufficient statistics behind it — per-dimension
    * DECIMAL sums `s_1..s_64` and the member count — so a maintainer
    * (s10) can fold a new batch into the index with pure decimal adds,
    * never re-reading the stored vectors (the whole point of keeping
    * sums: a mean is not foldable, its sufficient statistics are).
    *
    * Scale is (18,9), not exactMeanVec's (38,18): sums must survive a
    * decimal→double cast bit-identically in BOTH engines, and that cast
    * is only safely single-rounded while the UNSCALED value — |sum|·10⁹
    * — stays under 2^53 (the q19/q20 money-sum discipline; at scale 18
    * the unscaled sums pass 10^18 immediately and DuckDB's
    * int128→double→÷10^s double-rounding can drift 1 ULP from Spark's
    * correctly-rounded BigDecimal cast — the exactMeanVec portability
    * note). The honest bound: |sum| < 2^53/10⁹ ≈ 9.0·10⁶, i.e. ~10⁶
    * members per cluster at |x|≲10 — far above any IVF list an index
    * would tolerate (list size is a quality knob kept in the thousands;
    * a 10⁹-vector index raises k, not list mass). The SUMS themselves
    * stay exact at ANY size (decimal addition never rounds); only the
    * derived double output narrows, so past the bound the fold is still
    * correct and only the cross-engine bit-equality of the cast output
    * weakens to 1 ULP — which the argmin consumers tolerate by design.
    * Both engines round the element cast HALF_UP from the shortest
    * double representation.
    */
  private[graft] def centroidStats(v: DataFrame, labelCol: String): DataFrame =
    withCentroid(v.groupBy(col(labelCol).as("clabel"))
      .agg(statSumCols("s").head,
        (statSumCols("s").tail :+ count(lit(1)).as("cnt")): _*))

  /** The shared per-dimension exact-decimal sum aggregates of the
    * centroid store (see [[centroidStats]] for the scale rationale) —
    * ONE definition so the build and the fold can never drift.
    */
  private def statSumCols(prefix: String): Seq[org.apache.spark.sql.Column] =
    (1 to Dim).map(i =>
      sum(element_at(col("v"), i).cast(DecimalType(18, 9)))
        .cast(DecimalType(30, 9)).as(s"${prefix}_$i"))

  /** Derive the centroid columns (cent, cnrm) from a stats frame's
    * s_1..s_64 + cnt — shared by the build and the fold.
    */
  private[graft] def withCentroid(stats: DataFrame): DataFrame =
    stats
      .withColumn("cent", array((1 to Dim).map(i =>
        col(s"s_$i").cast("double") / col("cnt")): _*))
      .withColumn("cnrm", sqrt(dotFast(col("cent"), col("cent"))))

  /** DuckDB twin of [[centroidStats]]'s centroid derivation: scale-(18,9)
    * exact-decimal per-dimension mean list (see centroidStats for why
    * the persisted index quantizes at 9 digits where the in-plan
    * [[exactMeanVec]] uses 18).
    */
  private def sqlStatsMeanList(vecExpr: String, dim: Int): String =
    (1 to dim).map(i =>
      s"CAST(sum(CAST($vecExpr[$i] AS VARCHAR)::DECIMAL(18,9)) AS DOUBLE) / count(*)")
      .mkString("[", ",\n      ", "]")

  private def vectors(s: SparkSession, d: String): DataFrame = {
    graft.plans.VectorExpressions.register(s)
    Tables.embeddings(s, d)
      .select(col("vec_id"), vecD(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(dotFast(col("v"), col("v"))))
  }

  /** Sign-pattern LSH bucket in [0, 256) from 8 md5-derived hyperplanes.
    * The planes are materialized driver-side (hyperplaneArray — same md5
    * arithmetic the oracle regenerates in SQL) and injected as array
    * literals, so each bucket is 8 codegen'd dot products against
    * constants — no per-row md5, no interpreted fold.
    */
  private def bucketCol(v: Column): Column =
    (0 until 8).map { j =>
      when(dotFast(v, typedlit(hyperplaneArray(j, Dim).toSeq)) >= 0.0,
        lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  private val sqlVectors =
    """WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
      |n AS (SELECT vec_id, v,
      |  sqrt(list_reduce(list_transform(range(1, 65), i -> v[i] * v[i]), (x, y) -> x + y)) AS nrm
      |FROM e)""".stripMargin

  private val sqlBucket =
    """b AS (SELECT vec_id, v, nrm,
      |  list_reduce(list_transform(range(0, 8), j ->
      |    CASE WHEN list_reduce(list_transform(range(1, 65), i -> v[i] *
      |        ((('0x' || substr(md5('hp_' || j || '_' || i), 1, 15))::BIGINT % 2001 - 1000) / 1000.0)),
      |        (x, y) -> x + y) >= 0.0
      |      THEN CAST(power(2, j) AS BIGINT) ELSE 0 END), (x, y) -> x + y) AS bucket
      |FROM n)""".stripMargin

  /** `p`-plane sign bucket over the md5 hyperplane family starting at
    * plane `j0` — s18's graph-seed tables (two INDEPENDENT tables:
    * planes [0,p) and [p,2p); the family is unbounded). s18 derives
    * `p` from the corpus count so bucket occupancy stays ~8–12 as the
    * corpus scales: p = 4 (planes 0–3 / 4–7, the oracle twin
    * [[sqlBucket4]]) at the sf0.01 gate.
    */
  private def bucketPCol(v: Column, j0: Int, p: Int): Column =
    (0 until p).map { j =>
      when(dotFast(v, typedlit(hyperplaneArray(j0 + j, Dim).toSeq)) >= 0.0,
        lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** CTE `b4`: both 4-plane table buckets per vector (planes 0–3 → a,
    * 4–7 → b), the oracle twin of two [[bucketPCol]] calls at p = 4.
    */
  private val sqlBucket4 =
    """b4 AS (SELECT vec_id, v, nrm,
      |  list_reduce(list_transform(range(0, 4), j ->
      |    CASE WHEN list_reduce(list_transform(range(1, 65), i -> v[i] *
      |        ((('0x' || substr(md5('hp_' || j || '_' || i), 1, 15))::BIGINT % 2001 - 1000) / 1000.0)),
      |        (x, y) -> x + y) >= 0.0
      |      THEN CAST(power(2, j) AS BIGINT) ELSE 0 END), (x, y) -> x + y) AS bucket_a,
      |  list_reduce(list_transform(range(4, 8), j ->
      |    CASE WHEN list_reduce(list_transform(range(1, 65), i -> v[i] *
      |        ((('0x' || substr(md5('hp_' || j || '_' || i), 1, 15))::BIGINT % 2001 - 1000) / 1000.0)),
      |        (x, y) -> x + y) >= 0.0
      |      THEN CAST(power(2, j - 4) AS BIGINT) ELSE 0 END), (x, y) -> x + y) AS bucket_b
      |FROM n)""".stripMargin

  /** [[sqlBucket4]] over an arbitrary source CTE — the s31 upper layer
    * buckets its SPARSE node subset with the same hyperplane family
    * (a vector's bucket is corpus-independent).
    */
  private def sqlBucket4Of(src: String, name: String): String =
    sqlBucket4.replace("b4 AS (", s"$name AS (")
      .replace("FROM n)", s"FROM $src)")

  /** The LSH-seeded top-K neighbor CTEs (bucket pairs → per-src top 5)
    * over a bucketed CTE `b4x` — the oracle twin of [[lshSeedGraph]]'s
    * candidate+top-K, parameterized so the s31 upper layer reuses the
    * exact text the s30 lower graph is built from.
    */
  private def sqlLshTopK(b4x: String, p0: String, g0: String): String =
    s"""$p0 AS MATERIALIZED (SELECT s.vec_id AS src, t.vec_id AS dst,
       |    list_reduce(list_transform(range(1, 65), i -> s.v[i] * t.v[i]), (x, y) -> x + y)
       |      / (s.nrm * t.nrm) AS cosine
       |  FROM $b4x s JOIN $b4x t ON s.bucket_a = t.bucket_a AND s.vec_id <> t.vec_id
       |  UNION
       |  SELECT s.vec_id, t.vec_id,
       |    list_reduce(list_transform(range(1, 65), i -> s.v[i] * t.v[i]), (x, y) -> x + y)
       |      / (s.nrm * t.nrm)
       |  FROM $b4x s JOIN $b4x t ON s.bucket_b = t.bucket_b AND s.vec_id <> t.vec_id),
       |$g0 AS MATERIALIZED (SELECT src, dst, cosine FROM (
       |    SELECT src, dst, cosine,
       |      row_number() OVER (PARTITION BY src ORDER BY cosine DESC, dst) AS rk
       |    FROM $p0) WHERE rk <= 5)""".stripMargin

  /** The one-round descent graph + undirected search adjacency (p0 →
    * g0 → reverse-bounded candidates → re-scored union → g1 → adj2) —
    * the s18/s25/s30 build chain as oracle text, shared by the s30 and
    * s31 oracles so the two gates provably search the SAME graph.
    */
  private def sqlDescentAdj: String =
    s"""${sqlLshTopK("b4", "p0", "g0")},
       |rv AS MATERIALIZED (SELECT dst AS src, src AS dst FROM (
       |    SELECT src, dst,
       |      row_number() OVER (PARTITION BY dst ORDER BY cosine DESC, src) AS rrk
       |    FROM g0) WHERE rrk <= 5),
       |adj AS MATERIALIZED (SELECT src, dst FROM g0 UNION SELECT src, dst FROM rv),
       |non AS MATERIALIZED (SELECT DISTINCT a.src AS src, c.dst AS dst
       |  FROM adj a JOIN adj c ON a.dst = c.src WHERE a.src <> c.dst),
       |sc AS MATERIALIZED (SELECT non.src, non.dst,
       |    list_reduce(list_transform(range(1, 65), i -> s.v[i] * t.v[i]), (x, y) -> x + y)
       |      / (s.nrm * t.nrm) AS cosine
       |  FROM non JOIN n s ON non.src = s.vec_id JOIN n t ON non.dst = t.vec_id),
       |u AS MATERIALIZED (SELECT src, dst, max(cosine) AS cosine FROM (
       |    SELECT src, dst, cosine FROM g0
       |    UNION ALL SELECT src, dst, cosine FROM sc) GROUP BY 1, 2),
       |g1 AS MATERIALIZED (SELECT src, dst FROM (
       |    SELECT src, dst,
       |      row_number() OVER (PARTITION BY src ORDER BY cosine DESC, dst) AS rk
       |    FROM u) WHERE rk <= 5),
       |adj2 AS MATERIALIZED (SELECT src, dst FROM g1 UNION SELECT dst, src FROM g1)""".stripMargin

  /** `hops` unrolled beam-expansion CTEs over adjacency `graph`,
    * continuing from `<pfx>v0`: per hop, the beam (top `beam` of
    * visited), its unvisited neighbors, their scores, and the grown
    * visited set `<pfx>v<h>`. One generator for the s30 lower walk and
    * BOTH s31 layers — the loop body exists once per engine.
    */
  private def sqlBeamHops(graph: String, pfx: String, hops: Int,
      beam: Int): String =
    (1 to hops).map { h =>
      val vp = s"${pfx}v${h - 1}"
      // beam CTEs are named bm<h>, not b<h>: b4 would collide with the
      // bucket CTE of the same name
      s"""${pfx}bm$h AS MATERIALIZED (SELECT query_id, vec_id FROM (
         |    SELECT query_id, vec_id,
         |      row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rk
         |    FROM $vp) WHERE rk <= $beam),
         |${pfx}c$h AS MATERIALIZED (SELECT DISTINCT b.query_id, a.dst AS vec_id
         |  FROM ${pfx}bm$h b JOIN $graph a ON b.vec_id = a.src
         |  WHERE NOT EXISTS (SELECT 1 FROM $vp v
         |    WHERE v.query_id = b.query_id AND v.vec_id = a.dst)),
         |${pfx}s$h AS MATERIALIZED (SELECT c.query_id, c.vec_id,
         |    list_reduce(list_transform(range(1, 65), i -> n.v[i] * q.qv[i]), (x, y) -> x + y)
         |      / (n.nrm * q.qn) AS cosine
         |  FROM ${pfx}c$h c JOIN n ON n.vec_id = c.vec_id JOIN q ON q.query_id = c.query_id),
         |${pfx}v$h AS MATERIALIZED (SELECT * FROM $vp UNION ALL SELECT * FROM ${pfx}s$h)""".stripMargin
    }.mkString(",\n")

  /** The audit tail over a final visited CTE: top-5 answer, exact
    * truth, hits, visited counts — the s30/s31 shared report.
    */
  private def sqlBeamTail(vFinal: String): String =
    s"""ans AS (SELECT query_id, vec_id FROM (
       |    SELECT query_id, vec_id,
       |      row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rk
       |    FROM $vFinal WHERE vec_id <> query_id) WHERE rk <= 5),
       |ex AS MATERIALIZED (SELECT query_id, vec_id AS tru FROM (
       |    SELECT q.query_id, n.vec_id,
       |      row_number() OVER (PARTITION BY q.query_id ORDER BY
       |        list_reduce(list_transform(range(1, 65), i -> n.v[i] * q.qv[i]), (x, y) -> x + y)
       |          / (n.nrm * q.qn) DESC, n.vec_id) AS rank
       |    FROM n CROSS JOIN q WHERE n.vec_id <> q.query_id) WHERE rank <= 5),
       |h AS (SELECT ex.query_id, count(*)::BIGINT AS n FROM ex
       |  JOIN ans a ON ex.query_id = a.query_id AND ex.tru = a.vec_id GROUP BY 1),
       |nv AS (SELECT query_id, count(*)::BIGINT AS n_visited FROM $vFinal GROUP BY 1)
       |SELECT q.query_id, nv.n_visited,
       |  coalesce(h.n, 0)::BIGINT AS n_hits,
       |  coalesce(h.n, 0) * 1.0 / 5 AS recall_beam
       |FROM q JOIN nv ON q.query_id = nv.query_id
       |LEFT JOIN h ON q.query_id = h.query_id
       |ORDER BY q.query_id""".stripMargin

  private val PqM = 8
  private val PqSubDim = 8
  private val PqK = 16

  private val sqlVn =
    "vn AS (SELECT vec_id, list_transform(v, x -> x / nrm) AS vn FROM n)"

  /** cb0→cor: the oracle twin of [[pqReconstruct]] — seed codebook, one
    * Lloyd step (exact decimal-sum cell means), re-encode; `cor` is the
    * reconstructed corpus (vec_id, rv, drv). Shared by s06 and s07.
    */
  private val sqlPq =
    s"""cb0 AS (
       |  SELECT m.m, k.k,
       |    list_transform(range(1, 9), i ->
       |      (('0x' || substr(md5('pq_' || m.m || '_' || k.k || '_' || i), 1, 15))::BIGINT
       |        % 2001 - 1000) / 1000.0) AS c
       |  FROM (SELECT unnest(range(0, 8)) AS m) m,
       |       (SELECT unnest(range(0, 16)) AS k) k),
       |sub AS (
       |  SELECT n.vec_id, mm.m,
       |    list_transform(n.v[mm.m * 8 + 1 : mm.m * 8 + 8], x -> x / n.nrm) AS subv
       |  FROM n CROSS JOIN (SELECT unnest(range(0, 8)) AS m) mm),
       |s0 AS (
       |  SELECT sub.vec_id, sub.m, cb0.k, sub.subv, cb0.c,
       |    list_reduce(list_transform(range(1, 9), i -> subv[i] * subv[i]), (x, y) -> x + y)
       |    - 2.0 * list_reduce(list_transform(range(1, 9), i -> subv[i] * c[i]), (x, y) -> x + y)
       |    + list_reduce(list_transform(range(1, 9), i -> c[i] * c[i]), (x, y) -> x + y) AS d2
       |  FROM sub JOIN cb0 ON sub.m = cb0.m),
       |a0 AS (SELECT vec_id, m, k, subv FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, k) AS rn FROM s0)
       |  WHERE rn = 1),
       |tr AS (SELECT m, k, ${sqlMeanList("subv", PqSubDim)} AS tc
       |  FROM a0 GROUP BY m, k),
       |cb1 AS (
       |  SELECT cb0.m, cb0.k, coalesce(tr.tc, cb0.c) AS c
       |  FROM cb0 LEFT JOIN tr ON cb0.m = tr.m AND cb0.k = tr.k),
       |s1 AS (
       |  SELECT sub.vec_id, sub.m, cb1.k, cb1.c,
       |    list_reduce(list_transform(range(1, 9), i -> subv[i] * subv[i]), (x, y) -> x + y)
       |    - 2.0 * list_reduce(list_transform(range(1, 9), i -> subv[i] * c[i]), (x, y) -> x + y)
       |    + list_reduce(list_transform(range(1, 9), i -> c[i] * c[i]), (x, y) -> x + y) AS d2
       |  FROM sub JOIN cb1 ON sub.m = cb1.m),
       |a1 AS (SELECT vec_id, m, c FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, k) AS rn FROM s1)
       |  WHERE rn = 1),
       |rec AS (SELECT vec_id, flatten(list(c ORDER BY m)) AS rv FROM a1 GROUP BY vec_id),
       |cor AS (SELECT vec_id, rv,
       |    list_reduce(list_transform(range(1, 65), i -> rv[i] * rv[i]), (x, y) -> x + y) AS drv
       |  FROM rec)""".stripMargin

  /** IVF kNN shared by s03 (nprobe=1) and s08 (nprobe=2): exact coarse
    * centroids (broadcast k×dim), top-`nprobe` probes per query, exact
    * cosine top-3 within the probed disjoint lists (no dedup needed —
    * each corpus vector lives in exactly one). One body so a probe-logic
    * change (tie-breaks, centroid derivation, self-exclusion) can never
    * diverge the two gated queries. probe_rank — which probe produced
    * each neighbor — is emitted only for nprobe > 1 (s03's gated schema
    * predates it).
    */
  private def ivfKnn(s: SparkSession, d: String, nprobe: Int): DataFrame = {
    val e = Tables.embeddings(s, d)
    graft.plans.VectorExpressions.register(s)
    val v = e.select(col("vec_id"), col("label").cast("long").as("label"),
      vecD(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(dotFast(col("v"), col("v"))))
    val cent = coarseCentroids(v, "label")
    val q = v.filter(col("vec_id") % 50 === 0 && col("vec_id") < 2000)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("ccos").desc, col("label").asc)
    val probeCols = Seq(col("query_id"), col("qv"), col("qn"),
      col("label").as("probe_label")) ++
      (if (nprobe > 1) Seq(col("crank").as("probe_rank")) else Nil)
    val probe = q.crossJoin(broadcast(cent))
      .withColumn("ccos",
        dotFast(col("qv"), col("cent")) / (col("qn") * col("cnrm")))
      .withColumn("crank", row_number().over(wProbe))
      .filter(col("crank") <= nprobe)
      .select(probeCols: _*)
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    val outCols = Seq(col("query_id"), col("rank"),
      col("vec_id").as("neighbor_id"), col("probe_label")) ++
      (if (nprobe > 1) Seq(col("probe_rank")) else Nil)
    v.join(broadcast(probe), col("label") === col("probe_label"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine",
        dotFast(col("v"), col("qv")) / (col("nrm") * col("qn")))
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= 3)
      .select(outCols: _*)
      .orderBy("query_id", "rank")
  }

  /** DuckDB twin of [[ivfKnn]], parameterized the same way. */
  private def sqlIvfKnn(nprobe: Int): String = {
    val prProbe = if (nprobe > 1) ", crank AS probe_rank" else ""
    val prScored = if (nprobe > 1) ", p.probe_rank" else ""
    val pr = if (nprobe > 1) ", probe_rank" else ""
    s"""$sqlVectors,
       |v AS (SELECT vec_id, label::BIGINT AS label, v, nrm FROM (
       |  SELECT e2.vec_id, e2.label, n.v, n.nrm
       |  FROM embeddings e2 JOIN n ON e2.vec_id = n.vec_id)),
       |cent AS (SELECT label, ${sqlMeanList("v", Dim)} AS cent
       |  FROM v GROUP BY label),
       |centn AS (SELECT label, cent,
       |    sqrt(list_reduce(list_transform(range(1, 65), i -> cent[i] * cent[i]),
       |      (x, y) -> x + y)) AS cnrm FROM cent),
       |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM v WHERE vec_id % 50 = 0 AND vec_id < 2000),
       |probe0 AS (SELECT q.query_id, q.qv, q.qn, c.label,
       |    list_reduce(list_transform(range(1, 65), i -> q.qv[i] * c.cent[i]), (x, y) -> x + y)
       |      / (q.qn * c.cnrm) AS ccos
       |  FROM q CROSS JOIN centn c),
       |probe AS (SELECT query_id, qv, qn, label AS probe_label$prProbe FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY ccos DESC, label) AS crank
       |    FROM probe0) WHERE crank <= $nprobe),
       |scored AS (SELECT p.query_id, v.vec_id AS neighbor_id, p.probe_label$prScored,
       |    list_reduce(list_transform(range(1, 65), i -> v.v[i] * p.qv[i]), (x, y) -> x + y)
       |      / (v.nrm * p.qn) AS cosine
       |  FROM v JOIN probe p ON v.label = p.probe_label
       |  WHERE v.vec_id <> p.query_id),
       |ranked AS (SELECT query_id, neighbor_id, probe_label$pr,
       |  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
       |FROM scored)
       |SELECT query_id, rank, neighbor_id, probe_label$pr FROM ranked
       |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
  }

  /** s15/s17's shared truth scaffold: per sampled query, the EXACT
    * same-label (pre-filter) top-3 rows, each carrying its rank in the
    * GLOBAL cosine ordering (`rank_all` — the post-filter pool
    * membership test). One corpus×queries pass, the query set
    * broadcast. The within-label rank derives from rank_all AFTER the
    * label filter rather than a (query_id, lm) window: identical
    * semantics (rank_all already encodes the (cosine desc, vec_id)
    * order), but both windows then key on query_id alone and the
    * filtered rows stay sorted — ONE exchange, no second sort (the
    * two-key form plans the (query_id, lm) window first and pays a
    * second shuffle; asserted in PlanShapeSpec). DuckDB twin:
    * [[sqlFilteredTruth]].
    */
  private def filteredTruth(s: SparkSession, d: String): DataFrame = {
    graft.plans.VectorExpressions.register(s)
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), vecD(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(dotFast(col("v"), col("v"))))
    val q = e.filter(col("vec_id") % 50 === 0 && col("vec_id") < 2000)
      .select(col("vec_id").as("query_id"), col("label").as("qlabel"),
        col("v").as("qv"), col("nrm").as("qn"))
    val wAll = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    val wLab = Window.partitionBy(col("query_id"))
      .orderBy(col("rank_all").asc)
    e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("lm", col("label") === col("qlabel"))
      .withColumn("cosine",
        dotFast(col("v"), col("qv")) / (col("nrm") * col("qn")))
      .withColumn("rank_all", row_number().over(wAll))
      .filter(col("lm"))
      .withColumn("rank_lab", row_number().over(wLab))
      .filter(col("rank_lab") <= 3)
  }

  /** Oracle twin of [[filteredTruth]] — CTEs e→n→q→sc→rk→tr; `tr` is
    * the truth frame (query_id, vec_id, rank_lab, rank_all). Shared by
    * the s15 and s17 oracles so the sampling rate, cosine, and
    * tie-break can never diverge between them.
    */
  private val sqlFilteredTruth =
    s"""WITH e AS (SELECT vec_id, label,
       |    list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
       |n AS (SELECT vec_id, label, v,
       |    sqrt(list_reduce(list_transform(range(1, ${Dim + 1}),
       |      i -> v[i] * v[i]), (x, y) -> x + y)) AS nrm
       |  FROM e),
       |q AS (SELECT vec_id AS query_id, label AS qlabel, v AS qv, nrm AS qn
       |  FROM n WHERE vec_id % 50 = 0 AND vec_id < 2000),
       |sc AS (SELECT q.query_id, n.vec_id, n.label = q.qlabel AS lm,
       |    list_reduce(list_transform(range(1, ${Dim + 1}),
       |      i -> n.v[i] * q.qv[i]), (x, y) -> x + y) / (n.nrm * q.qn) AS cosine
       |  FROM n CROSS JOIN q WHERE n.vec_id <> q.query_id),
       |rk AS (SELECT query_id, vec_id, lm, cosine,
       |    row_number() OVER (PARTITION BY query_id, lm
       |      ORDER BY cosine DESC, vec_id) AS rank_lab,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC, vec_id) AS rank_all
       |  FROM sc),
       |tr AS (SELECT query_id, vec_id, rank_lab, rank_all FROM rk
       |  WHERE lm AND rank_lab <= 3)""".stripMargin

  val registry: Seq[Q] = Seq(

    Q("s01_knn_bruteforce",
      "exact cosine top-5 neighbors for the query set (vec_id % 50 = 0 AND vec_id < 2000)",
      (s, d) => {
        val e = vectors(s, d)
        val q = e.filter(col("vec_id") % 50 === 0 && col("vec_id") < 2000)
          .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("vec_id").asc)
        e.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("query_id"))
          .withColumn("cosine",
            dotFast(col("v"), col("qv")) / (col("nrm") * col("qn")))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
          .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"))
          .orderBy("query_id", "rank")
      },
      Some(s"""$sqlVectors,
             |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n WHERE vec_id % 50 = 0 AND vec_id < 2000),
             |scored AS (
             |  SELECT q.query_id, n.vec_id AS neighbor_id,
             |    list_reduce(list_transform(range(1, 65), i -> n.v[i] * q.qv[i]), (x, y) -> x + y)
             |      / (n.nrm * q.qn) AS cosine
             |  FROM n CROSS JOIN q WHERE n.vec_id <> q.query_id),
             |ranked AS (SELECT query_id, neighbor_id,
             |  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
             |FROM scored)
             |SELECT query_id, rank, neighbor_id FROM ranked
             |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),

    // IVF (inverted-file) ANN: coarse quantization by the `label` column's
    // exact per-cluster centroid; a query probes only its nearest
    // centroid's inverted list (~1/10 of the corpus here; nprobe > 1 =
    // union more lists). Centroids come from exactMeanVec's per-dimension
    // DECIMAL sums — exact, order-free and map-side-partial, so both
    // engines derive bit-equal centroids at any partitioning (the usual
    // avg() would be partition-order-dependent and break the oracle, and
    // a collect_list formulation would buffer whole clusters). Centroid
    // table is a broadcast dim; at 100 TB the lists are the partitioning
    // key of the vector store.
    Q("s03_knn_ivf",
      "IVF ANN: probe nearest exact-centroid cluster, top-3 within its list",
      (s, d) => ivfKnn(s, d, nprobe = 1),
      Some(sqlIvfKnn(nprobe = 1))),

    // Vector quantization / cluster assignment — the build step of the IVF
    // index (one k-means assignment iteration): every vector goes to its
    // nearest exact centroid. Centroid derivation shares s03's exact
    // decimal-sum mean; assignment is a broadcast cross join (k centroids)
    // + one window, i.e. O(n·k·dim) codegen'd dots with NO shuffle of the
    // corpus — at 100 TB the corpus stays put and only the k×dim centroid
    // table moves.
    Q("s04_centroid_assign",
      "assign each vector to its nearest exact-centroid cluster",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        graft.plans.VectorExpressions.register(s)
        val v = e.select(col("vec_id"), col("label").cast("long").as("own_label"),
          vecD(col("embedding")).as("v"))
          .withColumn("nrm", sqrt(dotFast(col("v"), col("v"))))
        val cent = coarseCentroids(
          v.select(col("own_label").as("clabel"), col("v")), "clabel")
        val w = Window.partitionBy(col("vec_id"))
          .orderBy(col("ccos").desc, col("clabel").asc)
        v.crossJoin(broadcast(cent))
          .withColumn("ccos",
            dotFast(col("v"), col("cent")) / (col("nrm") * col("cnrm")))
          .withColumn("crank", row_number().over(w))
          .filter(col("crank") === 1)
          .select(col("vec_id"), col("own_label"),
            col("clabel").as("assigned_label"),
            (col("own_label") === col("clabel")).as("is_own"))
          .orderBy("vec_id")
      },
      Some(s"""$sqlVectors,
             |v AS (SELECT vec_id, own_label, v, nrm FROM (
             |  SELECT e2.vec_id, e2.label::BIGINT AS own_label, n.v, n.nrm
             |  FROM embeddings e2 JOIN n ON e2.vec_id = n.vec_id)),
             |cent AS (SELECT own_label AS clabel, ${sqlMeanList("v", Dim)} AS cent
             |  FROM v GROUP BY own_label),
             |centn AS (SELECT clabel, cent,
             |    sqrt(list_reduce(list_transform(range(1, 65), i -> cent[i] * cent[i]),
             |      (x, y) -> x + y)) AS cnrm FROM cent),
             |scored AS (SELECT v.vec_id, v.own_label, c.clabel,
             |    list_reduce(list_transform(range(1, 65), i -> v.v[i] * c.cent[i]), (x, y) -> x + y)
             |      / (v.nrm * c.cnrm) AS ccos
             |  FROM v CROSS JOIN centn c),
             |ranked AS (SELECT vec_id, own_label, clabel, ccos,
             |  row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, clabel) AS crank
             |FROM scored)
             |SELECT vec_id, own_label, clabel AS assigned_label,
             |  own_label = clabel AS is_own
             |FROM ranked WHERE crank = 1 ORDER BY vec_id""".stripMargin)),

    Q("s02_knn_lsh",
      "LSH-bucketed ANN: top-3 within the query's sign bucket (8 hyperplanes)",
      (s, d) => {
        val e = vectors(s, d).withColumn("bucket", bucketCol(col("v")))
        val q = e.filter(col("vec_id") % 50 === 0 && col("vec_id") < 2000)
          .select(col("vec_id").as("query_id"), col("v").as("qv"),
            col("nrm").as("qn"), col("bucket"))
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("vec_id").asc)
        e.join(broadcast(q), Seq("bucket"))
          .filter(col("vec_id") =!= col("query_id"))
          .withColumn("cosine",
            dotFast(col("v"), col("qv")) / (col("nrm") * col("qn")))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
          .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
            col("bucket"))
          .orderBy("query_id", "rank")
      },
      Some(s"""$sqlVectors,
             |$sqlBucket,
             |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn, bucket FROM b WHERE vec_id % 50 = 0 AND vec_id < 2000),
             |scored AS (
             |  SELECT q.query_id, b.vec_id AS neighbor_id, b.bucket,
             |    list_reduce(list_transform(range(1, 65), i -> b.v[i] * q.qv[i]), (x, y) -> x + y)
             |      / (b.nrm * q.qn) AS cosine
             |  FROM b JOIN q USING (bucket) WHERE b.vec_id <> q.query_id),
             |ranked AS (SELECT query_id, neighbor_id, bucket,
             |  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
             |FROM scored)
             |SELECT query_id, rank, neighbor_id, bucket FROM ranked
             |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin)),

    // Multi-probe LSH: also search the 8 Hamming-distance-1 buckets (one
    // hyperplane sign flipped). Probing m buckets buys the recall of ~m
    // independent tables at the cost of ONE stored copy — the standard
    // memory/recall trade (Lv et al., VLDB'07). Implementation: the query
    // side explodes into 9 (bucket, query) probe rows, the corpus is
    // untouched — the probe table stays the broadcast side, the corpus
    // never reshuffles. Recall vs s01 is asserted by spec; the oracle
    // re-derives the same probe set in SQL (bucket XOR 2^j).
    Q("s05_knn_lsh_multiprobe",
      "multi-probe LSH ANN: top-3 across the query's bucket + 8 Hamming-1 probes",
      (s, d) => {
        val e = vectors(s, d).withColumn("bucket", bucketCol(col("v")))
        val q = e.filter(col("vec_id") % 50 === 0 && col("vec_id") < 2000)
          .select(col("vec_id").as("query_id"), col("v").as("qv"),
            col("nrm").as("qn"), col("bucket"))
          .withColumn("probe", explode(array(
            col("bucket") +: (0 until 8).map(j =>
              col("bucket").bitwiseXOR(lit(1L << j))): _*)))
          .drop("bucket")
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("vec_id").asc)
        e.join(broadcast(q), col("bucket") === col("probe"))
          .filter(col("vec_id") =!= col("query_id"))
          .withColumn("cosine",
            dotFast(col("v"), col("qv")) / (col("nrm") * col("qn")))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
          .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"))
          .orderBy("query_id", "rank")
      },
      Some(s"""$sqlVectors,
             |$sqlBucket,
             |q0 AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn, bucket FROM b WHERE vec_id % 50 = 0 AND vec_id < 2000),
             |q AS (SELECT query_id, qv, qn, unnest(list_prepend(bucket,
             |    list_transform(range(0, 8), j -> xor(bucket, CAST(power(2, j) AS BIGINT))))) AS probe
             |  FROM q0),
             |scored AS (
             |  SELECT q.query_id, b.vec_id AS neighbor_id,
             |    list_reduce(list_transform(range(1, 65), i -> b.v[i] * q.qv[i]), (x, y) -> x + y)
             |      / (b.nrm * q.qn) AS cosine
             |  FROM b JOIN q ON b.bucket = q.probe WHERE b.vec_id <> q.query_id),
             |ranked AS (SELECT query_id, neighbor_id,
             |  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
             |FROM scored)
             |SELECT query_id, rank, neighbor_id FROM ranked
             |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin)),

    // Product quantization (Jégou et al., PAMI'11) — the memory-bound ANN
    // path: vectors are L2-normalized (so ADC euclidean ranks like
    // cosine), the 64 dims split into 8 subspaces × 16 centroids, and
    // each corpus vector compresses to 8 four-bit codes (4 bytes vs 256).
    // Pipeline: md5-derived seed codebook (same determinism trick as the
    // s02 hyperplanes) → ONE distributed Lloyd refinement (assign, then
    // per-(m,k) exact decimal-sum mean — exactMeanVec, order-free and
    // map-side-partial, so both engines train bit-identical codebooks at
    // any partitioning; empty cells keep their seed) → re-encode → ADC
    // top-50 candidates per query → EXACT re-rank of just those 50.
    // Measured at sf0.01 the refinement+re-rank lifts recall@5 vs s01
    // from 0.06 (raw random codebook, top-5 by ADC) to ~0.36 — on
    // unstructured vectors, where distance concentration makes ANN recall
    // intrinsically hard.
    // Scale: assignment is corpus×8 sub-rows joined to a BROADCAST 128-row
    // codebook (three 8-dim codegen'd dots each; corpus never reshuffles
    // for the codebook); Lloyd's per-cell state is 8 decimals + a count.
    // This query's ADC deliberately scans the WHOLE corpus (it isolates
    // PQ); the IVF-pruned composition — coarse cluster prunes, PQ scans
    // only the surviving list, exact distance touches the final
    // candidates — is s07_knn_ivfpq below.
    Q("s06_knn_pq",
      "PQ/ADC ANN: 8x16 codebook + 1 Lloyd step, ADC top-50, exact re-rank top-5",
      (s, d) => {
        val e = vectors(s, d)
        val vn = e.select(col("vec_id"),
          transform(col("v"), x => x / col("nrm")).as("vn"))
        val rec = pqReconstruct(e)
        val q = vn.filter(col("vec_id") % 50 === 0 && col("vec_id") < 2000)
          .select(col("vec_id").as("query_id"), col("vn").as("qv"))
          .withColumn("dq", dotFast(col("qv"), col("qv")))
        val wAdc = Window.partitionBy(col("query_id"))
          .orderBy(col("dist2").asc, col("vec_id").asc)
        val cand = rec.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("query_id"))
          .withColumn("dist2",
            col("dq") - lit(2.0) * dotFast(col("qv"), col("rv")) + col("drv"))
          .withColumn("adc_rank", row_number().over(wAdc))
          .filter(col("adc_rank") <= 50)
          .select(col("query_id"), col("qv"), col("vec_id"))
        val wR = Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("vec_id").asc)
        cand.join(vn, Seq("vec_id"))
          .withColumn("cosine", dotFast(col("qv"), col("vn")))
          .withColumn("rank", row_number().over(wR))
          .filter(col("rank") <= 5)
          .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
            col("cosine"))
          .orderBy("query_id", "rank")
      },
      Some(s"""$sqlVectors,
             |$sqlVn,
             |$sqlPq,
             |q AS (SELECT vec_id AS query_id, vn AS qv,
             |    list_reduce(list_transform(range(1, 65), i -> vn[i] * vn[i]), (x, y) -> x + y) AS dq
             |  FROM vn WHERE vec_id % 50 = 0 AND vec_id < 2000),
             |adc AS (SELECT query_id, qv, vec_id FROM (
             |    SELECT q.query_id, q.qv, cor.vec_id,
             |      row_number() OVER (PARTITION BY q.query_id ORDER BY
             |        q.dq - 2.0 * list_reduce(list_transform(range(1, 65),
             |          i -> q.qv[i] * cor.rv[i]), (x, y) -> x + y) + cor.drv,
             |        cor.vec_id) AS adc_rank
             |    FROM cor CROSS JOIN q WHERE cor.vec_id <> q.query_id)
             |  WHERE adc_rank <= 50),
             |rr AS (SELECT adc.query_id, vn.vec_id AS neighbor_id,
             |    list_reduce(list_transform(range(1, 65), i -> adc.qv[i] * vn.vn[i]), (x, y) -> x + y) AS cosine
             |  FROM adc JOIN vn ON adc.vec_id = vn.vec_id),
             |ranked AS (SELECT query_id, neighbor_id, cosine,
             |  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
             |FROM rr)
             |SELECT query_id, rank, neighbor_id, cosine FROM ranked
             |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),

    // IVF + PQ — the composed 100 TB ANN path (the IVFADC scheme of Jégou
    // et al., PAMI'11 §IV): the coarse quantizer (s03's exact per-label
    // centroids) prunes each query to ONE inverted list, ADC scans only
    // the PQ codes of that list (~1/|lists| of the corpus instead of s06's
    // full scan), and the exact re-rank touches only the ADC top-20.
    // Plan shape: centroids and the probe table are broadcast dims, the
    // reconstructed corpus joins its label by vec_id (co-partitionable at
    // scale), and the ADC join key is label = probe_label — so corpus rows
    // outside probed lists are filtered at the join, which the plan-shape
    // spec pins by row count. Recall trades with nprobe exactly
    // as s03; memory per corpus vector is the 4-byte PQ code, as s06.
    Q("s07_knn_ivfpq",
      "IVF+PQ ANN: coarse probe prunes to one list, ADC within it, exact re-rank top-5",
      (s, d) => {
        val adcIn = ivfpqAdcInput(s, d)
        val wAdc = Window.partitionBy(col("query_id"))
          .orderBy(col("dist2").asc, col("vec_id").asc)
        val cand = adcIn
          .withColumn("dist2",
            col("dq") - lit(2.0) * dotFast(col("qv"), col("rv")) + col("drv"))
          .withColumn("adc_rank", row_number().over(wAdc))
          .filter(col("adc_rank") <= 20)
          .select(col("query_id"), col("qv"), col("vec_id"), col("probe_label"))
        val vn = vectors(s, d).select(col("vec_id"),
          transform(col("v"), x => x / col("nrm")).as("vn"))
        val wR = Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("vec_id").asc)
        cand.join(vn, Seq("vec_id"))
          .withColumn("cosine", dotFast(col("qv"), col("vn")))
          .withColumn("rank", row_number().over(wR))
          .filter(col("rank") <= 5)
          .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
            col("probe_label"), col("cosine"))
          .orderBy("query_id", "rank")
      },
      Some(s"""$sqlVectors,
             |$sqlVn,
             |$sqlPq,
             |lab AS (SELECT vec_id, label::BIGINT AS label FROM embeddings),
             |cent0 AS (SELECT lab.label, ${sqlMeanList("n.v", Dim)} AS cent
             |  FROM n JOIN lab ON n.vec_id = lab.vec_id GROUP BY lab.label),
             |centn AS (SELECT label, cent,
             |    sqrt(list_reduce(list_transform(range(1, 65), i -> cent[i] * cent[i]),
             |      (x, y) -> x + y)) AS cnrm FROM cent0),
             |q0 AS (SELECT vec_id AS query_id, v AS qv0, nrm AS qn FROM n WHERE vec_id % 50 = 0 AND vec_id < 2000),
             |probe0 AS (SELECT q0.query_id, q0.qv0, q0.qn, c.label,
             |    list_reduce(list_transform(range(1, 65), i -> q0.qv0[i] * c.cent[i]), (x, y) -> x + y)
             |      / (q0.qn * c.cnrm) AS ccos
             |  FROM q0 CROSS JOIN centn c),
             |probe AS (SELECT query_id, qv, probe_label,
             |    list_reduce(list_transform(range(1, 65), i -> qv[i] * qv[i]), (x, y) -> x + y) AS dq
             |  FROM (SELECT query_id, list_transform(qv0, x -> x / qn) AS qv, label AS probe_label
             |    FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY ccos DESC, label) AS crank
             |      FROM probe0)
             |    WHERE crank = 1)),
             |corL AS (SELECT cor.vec_id, cor.rv, cor.drv, lab.label
             |  FROM cor JOIN lab USING (vec_id)),
             |adc AS (SELECT query_id, qv, vec_id, probe_label FROM (
             |    SELECT p.query_id, p.qv, c.vec_id, p.probe_label,
             |      row_number() OVER (PARTITION BY p.query_id ORDER BY
             |        p.dq - 2.0 * list_reduce(list_transform(range(1, 65),
             |          i -> p.qv[i] * c.rv[i]), (x, y) -> x + y) + c.drv,
             |        c.vec_id) AS adc_rank
             |    FROM corL c JOIN probe p ON c.label = p.probe_label
             |    WHERE c.vec_id <> p.query_id)
             |  WHERE adc_rank <= 20),
             |rr AS (SELECT adc.query_id, vn.vec_id AS neighbor_id, adc.probe_label,
             |    list_reduce(list_transform(range(1, 65), i -> adc.qv[i] * vn.vn[i]), (x, y) -> x + y) AS cosine
             |  FROM adc JOIN vn ON adc.vec_id = vn.vec_id),
             |ranked AS (SELECT query_id, neighbor_id, probe_label, cosine,
             |  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
             |FROM rr)
             |SELECT query_id, rank, neighbor_id, probe_label, cosine FROM ranked
             |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),

    // IVF with nprobe=2 — the recall knob every IVF index exposes
    // (FAISS's nprobe): probe the TWO nearest coarse centroids and search
    // the union of their inverted lists. The lists are disjoint (each
    // corpus vector lives in exactly one), so the union needs no dedup;
    // candidates double vs s03 and recall rises accordingly, while the
    // corpus still never reshuffles — the 2-rows-per-query probe table is
    // the broadcast side, exactly s03's plan with twice the probe rows.
    // probe_rank records which probe produced each neighbor, making the
    // recall contribution of the second list auditable from the output.
    Q("s08_knn_ivf_multiprobe",
      "IVF ANN with nprobe=2: top-3 exact cosine within the two nearest centroids' lists",
      (s, d) => ivfKnn(s, d, nprobe = 2),
      Some(sqlIvfKnn(nprobe = 2))),

    // SemDeDup (Abbas et al., 2023) — semantic near-dup removal at
    // embedding scale, and the scale path for d05's brute-force
    // all-pairs: k-means-cluster the corpus, then compare ONLY within a
    // cluster, so the pair space drops from n² to Σ|cluster|². Pipeline
    // here: exact-decimal centroids (s03's trainer) → nearest-centroid
    // assignment (s04, broadcast k×dim — the corpus never shuffles for
    // it) → ONE cluster exchange feeding BOTH self-join sides via
    // ReuseExchange (ENSURE_REQUIREMENTS, not an explicit repartition —
    // the d02 lesson: REPARTITION_BY_COL would block AQE's skew-split on
    // a hot cluster) → within-cluster cosine ≥ 0.35
    // pairs → each duplicate charged to its best-matching lower-id
    // keeper. At 100 TB: k grows with n to bound Σ|cluster|², a hot
    // cluster is AQE's skew-split case, and the verdict per vector is
    // one output row — registered in the Dedup family (d13) though it
    // lives here with the vector machinery.
    Q("d13_semantic_dedup",
      "SemDeDup: within-cluster cosine >= 0.35 marks higher-id vector a dup of its best lower-id keeper",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        graft.plans.VectorExpressions.register(s)
        val v = e.select(col("vec_id"), col("label").cast("long").as("own_label"),
          vecD(col("embedding")).as("v"))
          .withColumn("nrm", sqrt(dotFast(col("v"), col("v"))))
        val cent = coarseCentroids(
          v.select(col("own_label").as("clabel"), col("v")), "clabel")
        val wA = Window.partitionBy(col("vec_id"))
          .orderBy(col("ccos").desc, col("clabel").asc)
        val assigned = v.crossJoin(broadcast(cent))
          .withColumn("ccos",
            dotFast(col("v"), col("cent")) / (col("nrm") * col("cnrm")))
          .withColumn("arank", row_number().over(wA))
          .filter(col("arank") === 1)
          .select(col("vec_id"), col("v"), col("nrm"),
            col("clabel").as("cluster"))
        val wBest = Window.partitionBy(col("dup_id"))
          .orderBy(col("cosine").desc, col("keep_id").asc)
        // merge-hinted self-join (the d02 rationale): one reused
        // ENSURE_REQUIREMENTS cluster exchange, AQE-skew-splittable on a
        // hot cluster, never a broadcast of the corpus side
        assigned.as("a").hint("merge").join(assigned.as("b"), Seq("cluster"))
          .filter(col("a.vec_id") < col("b.vec_id"))
          .withColumn("cosine",
            dotFast(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")))
          .filter(col("cosine") >= 0.35)
          .select(col("cluster"), col("a.vec_id").as("keep_id"),
            col("b.vec_id").as("dup_id"), col("cosine"))
          .withColumn("prank", row_number().over(wBest))
          .filter(col("prank") === 1)
          .select(col("dup_id"), col("keep_id"), col("cluster"), col("cosine"))
          .orderBy("dup_id")
      },
      Some(s"""$sqlVectors,
             |lab AS (SELECT vec_id, label::BIGINT AS clabel0 FROM embeddings),
             |v AS (SELECT n.vec_id, n.v, n.nrm, lab.clabel0
             |  FROM n JOIN lab ON n.vec_id = lab.vec_id),
             |cent AS (SELECT clabel0 AS clabel, ${sqlMeanList("v", Dim)} AS cent
             |  FROM v GROUP BY clabel0),
             |centn AS (SELECT clabel, cent,
             |    sqrt(list_reduce(list_transform(range(1, 65), i -> cent[i] * cent[i]),
             |      (x, y) -> x + y)) AS cnrm FROM cent),
             |a0 AS (SELECT v.vec_id, v.v, v.nrm, c.clabel,
             |    list_reduce(list_transform(range(1, 65), i -> v.v[i] * c.cent[i]), (x, y) -> x + y)
             |      / (v.nrm * c.cnrm) AS ccos
             |  FROM v CROSS JOIN centn c),
             |assigned AS (SELECT vec_id, v, nrm, clabel AS cluster FROM (
             |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, clabel) AS arank
             |    FROM a0) WHERE arank = 1),
             |p AS (SELECT a.cluster, a.vec_id AS keep_id, b.vec_id AS dup_id,
             |    list_reduce(list_transform(range(1, 65), i -> a.v[i] * b.v[i]), (x, y) -> x + y)
             |      / (a.nrm * b.nrm) AS cosine
             |  FROM assigned a JOIN assigned b
             |    ON a.cluster = b.cluster AND a.vec_id < b.vec_id),
             |best AS (SELECT dup_id, keep_id, cluster, cosine FROM (
             |    SELECT *, row_number() OVER (PARTITION BY dup_id ORDER BY cosine DESC, keep_id) AS prank
             |    FROM p WHERE cosine >= 0.35) WHERE prank = 1)
             |SELECT dup_id, keep_id, cluster, cosine FROM best
             |ORDER BY dup_id""".stripMargin)),

    // The vector leg of the incremental-warehouse trio (d15 near-dup,
    // d16 exact, s09 ANN): a production IVF index is MAINTAINED, not
    // retrained — centroids live as a k×dim warehouse table and each
    // arriving batch is assigned against them and appended to its
    // inverted list. Here TODAY's batch (vec_id % 5 = 4) is assigned
    // against centroids PERSISTED from the stored corpus only (written/
    // read back exactly as an index build would leave them): the stored
    // VECTORS never enter the assignment plan — only their k-row
    // centroid summary does, broadcast onto the new batch, which itself
    // never shuffles (the s04 scale shape, now with the dimension table
    // coming from parquet instead of a same-frame aggregate). The
    // oracle recomputes stored-slice centroids and the assignment
    // exactly (decimal-exact means, pinned-fold cosines).
    Q("s09_incremental_assign",
      "new-batch (vec_id%5=4) vectors assigned against the persisted centroid store, stored vectors never re-read",
      (s, d) => {
        graft.plans.VectorExpressions.register(s)
        val isNew = col("vec_id") % 5 === 4
        val e = Tables.embeddings(s, d)
        // built ONCE per JVM (StoreFixture — per-process path, no
        // cross-process races): the gated query times the daily
        // assignment only, not the index build it consumes. The store is
        // [[centroidStats]] — centroids PLUS their sufficient statistics
        // — one table serving both the assigner (here) and the s10
        // maintainer; the assigner reads only the centroid columns.
        val store = centroidStore(s, d)
        val cent = s.read.parquet(store)
          .select(col("clabel"), col("cent"), col("cnrm"))
        val vNew = e.filter(isNew)
          .select(col("vec_id"), vecD(col("embedding")).as("v"))
          .withColumn("nrm", sqrt(dotFast(col("v"), col("v"))))
        val w = Window.partitionBy(col("vec_id"))
          .orderBy(col("ccos").desc, col("clabel").asc)
        vNew.crossJoin(broadcast(cent))
          .withColumn("ccos",
            dotFast(col("v"), col("cent")) / (col("nrm") * col("cnrm")))
          .withColumn("crank", row_number().over(w))
          .filter(col("crank") === 1)
          // assignment only, no raw ccos column: centroid-derived
          // cosines can differ by 1 ULP across engines (the decimal →
          // double cast's last bit), which is harmless for the argmin
          // (s03/s04/d13 rank on it) but would fail a bit-exact output
          // hash
          .select(col("vec_id"), col("clabel").as("assigned_label"))
          .orderBy("vec_id")
      },
      Some(s"""$sqlVectors,
             |v AS (SELECT n.vec_id, e2.label::BIGINT AS clabel0, n.v, n.nrm
             |  FROM n JOIN embeddings e2 ON e2.vec_id = n.vec_id),
             |cent AS (SELECT clabel0 AS clabel, ${sqlStatsMeanList("v", Dim)} AS cent
             |  FROM v WHERE vec_id % 5 <> 4 GROUP BY clabel0),
             |centn AS (SELECT clabel, cent,
             |    sqrt(list_reduce(list_transform(range(1, 65), i -> cent[i] * cent[i]),
             |      (x, y) -> x + y)) AS cnrm FROM cent),
             |newv AS (SELECT vec_id, v, nrm FROM n WHERE vec_id % 5 = 4),
             |scored AS (SELECT newv.vec_id, c.clabel,
             |    list_reduce(list_transform(range(1, 65), i -> newv.v[i] * c.cent[i]), (x, y) -> x + y)
             |      / (newv.nrm * c.cnrm) AS ccos
             |  FROM newv CROSS JOIN centn c),
             |ranked AS (SELECT vec_id, clabel, ccos,
             |  row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, clabel) AS crank
             |FROM scored)
             |SELECT vec_id, clabel AS assigned_label
             |FROM ranked WHERE crank = 1 ORDER BY vec_id""".stripMargin)),

    // The MAINTENANCE leg completing the incremental-ANN lifecycle
    // (build → s09 assign → THIS): a production IVF index must absorb
    // its daily batches into the centroids themselves — periodically,
    // not per-query — or assignment quality decays as the corpus
    // drifts. A mean is not foldable, so the store keeps each
    // centroid's sufficient statistics (exact per-dimension decimal
    // sums + member count, [[centroidStats]]); the Lloyd update is then
    // one pure decimal add per (cluster, dim): assign the new batch to
    // its nearest stored centroid (s09's plan), aggregate the batch's
    // own sums, fold. The stored VECTORS are never re-read — at 100 TB
    // the update touches a k×64-row sidecar and the batch, nothing
    // else. Output is the updated statistics long-form (clabel, dim,
    // upd_sum, upd_cnt, upd_mean): sums stay exact decimals until one
    // final single-rounded cast (the centroidStats scale-9 contract),
    // so the oracle pins the fold bit-for-bit — "decimal-exact means".
    Q("s10_centroid_update",
      "Lloyd maintenance of the persisted centroid store: fold the new batch (vec_id%5=4) into exact per-dim sums/counts, stored vectors never re-read",
      (s, d) => {
        graft.plans.VectorExpressions.register(s)
        val vNew = Tables.embeddings(s, d).filter(col("vec_id") % 5 === 4)
          .select(col("vec_id"), vecD(col("embedding")).as("v"))
        // one fold implementation: the gate's output is the unpivot of
        // the WRITE-BACK frame ([[foldedCentroidStats]] — what an
        // actual maintenance job would overwrite the sidecar with), so
        // the oracle gates the very statistics the next day's s09 reads
        val upd = foldedCentroidStats(
          s.read.parquet(centroidStore(s, d)), vNew)
        upd.select(col("clabel"), col("cnt").as("upd_cnt"),
            posexplode(array((1 to Dim).map(i => col(s"s_$i")): _*))
              .as(Seq("pos", "fold")))
          .select(col("clabel"), (col("pos") + 1).as("dim"),
            col("fold").cast("double").as("upd_sum"), col("upd_cnt"),
            (col("fold").cast("double") / col("upd_cnt")).as("upd_mean"))
          .orderBy("clabel", "dim")
      },
      Some(s"""$sqlVectors,
             |v AS (SELECT n.vec_id, e2.label::BIGINT AS clabel0, n.v, n.nrm
             |  FROM n JOIN embeddings e2 ON e2.vec_id = n.vec_id),
             |idx AS (SELECT unnest(range(1, ${Dim + 1})) AS dim),
             |stats AS (SELECT clabel0 AS clabel, dim,
             |    sum(CAST(v[dim] AS VARCHAR)::DECIMAL(18,9))::DECIMAL(30,9) AS csum,
             |    count(*) AS cnt
             |  FROM v CROSS JOIN idx WHERE vec_id % 5 <> 4 GROUP BY 1, 2),
             |cent AS (SELECT clabel0 AS clabel, ${sqlStatsMeanList("v", Dim)} AS cent
             |  FROM v WHERE vec_id % 5 <> 4 GROUP BY clabel0),
             |centn AS (SELECT clabel, cent,
             |    sqrt(list_reduce(list_transform(range(1, ${Dim + 1}), i -> cent[i] * cent[i]),
             |      (x, y) -> x + y)) AS cnrm FROM cent),
             |newv AS (SELECT vec_id, v, nrm FROM n WHERE vec_id % 5 = 4),
             |scored AS (SELECT newv.vec_id, newv.v, c.clabel,
             |    list_reduce(list_transform(range(1, ${Dim + 1}), i -> newv.v[i] * c.cent[i]), (x, y) -> x + y)
             |      / (newv.nrm * c.cnrm) AS ccos
             |  FROM newv CROSS JOIN centn c),
             |assigned AS (SELECT vec_id, v, clabel FROM (
             |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, clabel) AS crank
             |    FROM scored) WHERE crank = 1),
             |batch AS (SELECT clabel, dim,
             |    sum(CAST(v[dim] AS VARCHAR)::DECIMAL(18,9))::DECIMAL(30,9) AS bsum,
             |    count(*) AS bcnt
             |  FROM assigned CROSS JOIN idx GROUP BY 1, 2),
             |fold AS (SELECT s.clabel, s.dim,
             |    s.csum + coalesce(b.bsum, 0::DECIMAL(30,9)) AS f,
             |    s.cnt + coalesce(b.bcnt, 0) AS upd_cnt
             |  FROM stats s LEFT JOIN batch b ON s.clabel = b.clabel AND s.dim = b.dim)
             |SELECT clabel, dim, CAST(f AS DOUBLE) AS upd_sum, upd_cnt,
             |  CAST(f AS DOUBLE) / upd_cnt AS upd_mean
             |FROM fold ORDER BY clabel, dim""".stripMargin)),

    // Int8 vector compression — the scalar-quantization storage step
    // (FAISS SQ8) every production vector store runs before indexing:
    // per-vector symmetric scale amax = max|x_i|, code_i =
    // round(x_i·127/amax) ∈ [-127,127] — float32 shrinks 4×, and the
    // per-dimension reconstruction error is bounded by amax/254. The
    // gate emits codes, scale AND the error column so the compression's
    // quality is itself hash-audited. Everything is bit-portable: amax
    // is a selection (carries a float32 bit pattern), codes derive from
    // two pinned-order IEEE ops + floor, the error from two more —
    // both engines run the identical op sequence (Kernels.int8Quant vs
    // the oracle's expression twin). Scale shape: one typed-kernel
    // pass, zero shuffle, output 64 rows/vector — the operator rides
    // the parquet scan at any corpus size (the t01/d04 narrow-
    // projection class), and the codes are exactly what the s06/s07 PQ
    // path would persist.
    Q("s11_int8_quantize",
      "per-vector symmetric int8 quantization: codes, scale, per-dim reconstruction error",
      (s, d) => {
        import s.implicits._
        Tables.embeddings(s, d)
          .filter(col("embedding").isNotNull)
          .select(col("vec_id"), col("embedding"))
          .as[(Long, Array[Float])]
          .mapPartitions(_.flatMap { case (id, v) =>
            val (amax, codes, errs) = graft.functions.Kernels.int8Quant(v)
            codes.indices.iterator.map(i =>
              (id, (i + 1).toLong, codes(i), amax, errs(i)))
          })
          .toDF("vec_id", "dim", "code", "amax", "abs_err")
          .orderBy("vec_id", "dim")
      },
      Some(s"""WITH a AS (SELECT vec_id, embedding,
             |    list_aggregate(list_transform(embedding,
             |      x -> abs(CAST(x AS DOUBLE))), 'max') AS amax
             |  FROM embeddings WHERE embedding IS NOT NULL),
             |idx AS (SELECT unnest(range(1, ${Dim + 1})) AS dim),
             |q AS (SELECT vec_id, dim, amax,
             |    CAST(embedding[dim] AS DOUBLE) AS x
             |  FROM a CROSS JOIN idx),
             |c AS (SELECT vec_id, dim,
             |    (CASE WHEN amax = 0 THEN 0
             |      ELSE floor((x * 127.0) / amax + 0.5) END)::BIGINT AS code,
             |    amax, x FROM q)
             |SELECT vec_id, dim, code, amax,
             |  abs((code * amax) / 127.0 - x) AS abs_err
             |FROM c ORDER BY vec_id, dim""".stripMargin)),

    // Quantization recall audit — did s11's 4× compression cost any
    // retrieval quality? Asymmetric-distance search (the ADC setup of
    // s06/s07: queries stay full-precision, the CORPUS is int8-
    // reconstructed) re-ranks the s01 query set against the quantized
    // corpus, and recall@5 = |top5_exact ∩ top5_quant| / 5 per query —
    // the d20 discipline (an index change ships with its measured
    // quality bill) applied to the compression step, closing the
    // quantize → search → audit lifecycle. Bit-portability: the
    // reconstruction (floor-code · amax / 127) is s11's pinned IEEE
    // chain, both cosines are dotFast's left-fold order, and the rank
    // tiebreak is vec_id — every double is bit-equal cross-engine, so
    // the intersection COUNT is exact. Scale shape: one kernel pass
    // emits (v, rv) together so the corpus is scanned ONCE; the sampled
    // query set broadcasts (never the corpus); both rank windows
    // partition on query_id so they share ONE exchange (plan-asserted).
    // The Q×N window volume is the audit's irreducible cost — it runs
    // on the sampled query set by design (the d20/s01 audit class), not
    // per-corpus-row.
    Q("s12_int8_recall_audit",
      "recall@5 of int8-quantized-corpus search vs exact search, full-precision queries (ADC)",
      (s, d) => {
        import s.implicits._
        graft.plans.VectorExpressions.register(s)
        val rec = Tables.embeddings(s, d)
          .filter(col("embedding").isNotNull)
          .select(col("vec_id"), col("embedding"))
          .as[(Long, Array[Float])]
          .mapPartitions(_.map { case (id, emb) =>
            val (amax, codes, _) = graft.functions.Kernels.int8Quant(emb)
            val v = new Array[Double](emb.length)
            val rv = new Array[Double](emb.length)
            var i = 0
            while (i < emb.length) {
              v(i) = emb(i).toDouble
              rv(i) = codes(i) * amax / 127.0
              i += 1
            }
            (id, v, rv)
          })
          .toDF("vec_id", "v", "rv")
          .withColumn("nrm", sqrt(dotFast(col("v"), col("v"))))
          .withColumn("rnrm", sqrt(dotFast(col("rv"), col("rv"))))
        // queries are FULL-PRECISION (ADC) so they never need the
        // kernel: derive them straight off the scan with the sample
        // filter applied first — the kernel pass stays corpus-side only
        // (plan-asserted: one MapPartitions in the whole plan)
        val q = Tables.embeddings(s, d)
          .filter(col("embedding").isNotNull && col("vec_id") % 50 === 0 && col("vec_id") < 2000)
          .select(col("vec_id").as("query_id"),
            vecD(col("embedding")).as("qv"))
          .withColumn("qn", sqrt(dotFast(col("qv"), col("qv"))))
        val we = Window.partitionBy(col("query_id"))
          .orderBy(col("ce").desc, col("vec_id").asc)
        val wq = Window.partitionBy(col("query_id"))
          .orderBy(col("cq").desc, col("vec_id").asc)
        rec.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("query_id"))
          .withColumn("ce", dotFast(col("v"), col("qv")) / (col("nrm") * col("qn")))
          .withColumn("cq", dotFast(col("rv"), col("qv")) / (col("rnrm") * col("qn")))
          .withColumn("rank_e", row_number().over(we))
          .withColumn("rank_q", row_number().over(wq))
          .filter(col("rank_e") <= 5 || col("rank_q") <= 5)
          .groupBy("query_id")
          .agg(sum(when(col("rank_e") <= 5 && col("rank_q") <= 5, 1L)
            .otherwise(0L)).as("n_common"))
          .withColumn("recall_at_5", col("n_common") * lit(1.0) / 5)
          .orderBy("query_id")
      },
      Some(s"""WITH a AS (SELECT vec_id,
             |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
             |    list_aggregate(list_transform(embedding,
             |      x -> abs(CAST(x AS DOUBLE))), 'max') AS amax
             |  FROM embeddings WHERE embedding IS NOT NULL),
             |r AS (SELECT vec_id, v,
             |    list_transform(range(1, ${Dim + 1}), i ->
             |      CASE WHEN amax = 0 THEN 0.0
             |        ELSE (floor((v[i] * 127.0) / amax + 0.5) * amax) / 127.0
             |      END) AS rv
             |  FROM a),
             |n AS (SELECT vec_id, v, rv,
             |    sqrt(list_reduce(list_transform(range(1, ${Dim + 1}),
             |      i -> v[i] * v[i]), (x, y) -> x + y)) AS nrm,
             |    sqrt(list_reduce(list_transform(range(1, ${Dim + 1}),
             |      i -> rv[i] * rv[i]), (x, y) -> x + y)) AS rnrm
             |  FROM r),
             |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn
             |  FROM n WHERE vec_id % 50 = 0 AND vec_id < 2000),
             |sc AS (SELECT q.query_id, n.vec_id,
             |    list_reduce(list_transform(range(1, ${Dim + 1}),
             |      i -> n.v[i] * q.qv[i]), (x, y) -> x + y) / (n.nrm * q.qn) AS ce,
             |    list_reduce(list_transform(range(1, ${Dim + 1}),
             |      i -> n.rv[i] * q.qv[i]), (x, y) -> x + y) / (n.rnrm * q.qn) AS cq
             |  FROM n CROSS JOIN q WHERE n.vec_id <> q.query_id),
             |rk AS (SELECT query_id, vec_id,
             |    row_number() OVER (PARTITION BY query_id
             |      ORDER BY ce DESC, vec_id) AS rank_e,
             |    row_number() OVER (PARTITION BY query_id
             |      ORDER BY cq DESC, vec_id) AS rank_q
             |  FROM sc)
             |SELECT query_id,
             |  sum(CASE WHEN rank_e <= 5 AND rank_q <= 5 THEN 1 ELSE 0 END)::BIGINT
             |    AS n_common,
             |  sum(CASE WHEN rank_e <= 5 AND rank_q <= 5 THEN 1 ELSE 0 END)::BIGINT
             |    * 1.0 / 5 AS recall_at_5
             |FROM rk GROUP BY query_id ORDER BY query_id""".stripMargin)),

    // IVF index health report — the third leg of the index-audit triad
    // (d20: LSH band geometry, s12: quantization loss, s13: list
    // BALANCE and centroid SEPARATION). List skew is THE IVF failure
    // mode at scale: a list holding 30% of the corpus makes nprobe=1
    // probes scan 30% of 100 TB, and two near-coincident centroids make
    // probe choice arbitrary (recall collapses for queries between
    // them). Per list: mass, corpus share (one IEEE division over exact
    // integers), and the nearest-other-centroid Euclidean margin with
    // its argmin label (tiebreak: label). Centroids are the PERSISTED
    // index's scale-(18,9) exact-decimal means (centroidStats — the
    // same derivation s09 assigns against and s10 folds into, so the
    // audit measures the index that actually serves). Distances run the
    // pinned chain (a_i−b_i)·(a_i−b_i) left-folded then sqrt — both
    // engines bit-equal. Scale shape: ONE corpus scan collapses
    // map-side to k sufficient-statistics rows (checkpointed — k rows,
    // not data); everything after (k² pair distances, the argmin
    // window, the 1-row total) is k-bounded driver-trivia that never
    // touches the corpus again.
    Q("s13_ivf_balance",
      "IVF health: per-list mass + share + nearest-centroid separation margin from the persisted index stats",
      (s, d) => {
        graft.plans.VectorExpressions.register(s)
        val v = Tables.embeddings(s, d)
          .filter(col("embedding").isNotNull)
          .select(col("label").cast("long").as("clabel"),
            vecD(col("embedding")).as("v"))
        val lists = centroidStats(v, "clabel")
          .select(col("clabel"), col("cnt").as("n_vectors"), col("cent"))
          .localCheckpoint(true)
        val total = lists.agg(sum(col("n_vectors")).as("total"))
        val pairs = lists.select(col("clabel"), col("cent"))
          .crossJoin(broadcast(lists.select(col("clabel").as("olabel"),
            col("cent").as("ocent"))))
          .filter(col("clabel") =!= col("olabel"))
          .withColumn("diff",
            zip_with(col("cent"), col("ocent"), (x, y) => x - y))
          .withColumn("dist", sqrt(dotFast(col("diff"), col("diff"))))
        val w = Window.partitionBy(col("clabel"))
          .orderBy(col("dist").asc, col("olabel").asc)
        val nn = pairs.withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1)
          .select(col("clabel"), col("olabel").as("nn_label"),
            col("dist").as("nn_dist"))
        lists.join(nn, Seq("clabel"))
          .crossJoin(broadcast(total))
          .select(col("clabel"), col("n_vectors"),
            (col("n_vectors") * lit(1.0) / col("total")).as("share"),
            col("nn_label"), col("nn_dist"))
          .orderBy("clabel")
      },
      Some(s"""WITH e AS (SELECT label::BIGINT AS clabel,
             |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
             |  FROM embeddings WHERE embedding IS NOT NULL),
             |st AS (SELECT clabel, ${sqlStatsMeanList("v", Dim)} AS cent,
             |    count(*)::BIGINT AS n_vectors
             |  FROM e GROUP BY clabel),
             |tot AS (SELECT sum(n_vectors)::BIGINT AS total FROM st),
             |p AS (SELECT a.clabel, b.clabel AS olabel,
             |    sqrt(list_reduce(list_transform(range(1, ${Dim + 1}),
             |      i -> (a.cent[i] - b.cent[i]) * (a.cent[i] - b.cent[i])),
             |      (x, y) -> x + y)) AS dist
             |  FROM st a JOIN st b ON a.clabel <> b.clabel),
             |nn AS (SELECT clabel, olabel, dist,
             |    row_number() OVER (PARTITION BY clabel
             |      ORDER BY dist, olabel) AS rk FROM p)
             |SELECT s.clabel, s.n_vectors,
             |  s.n_vectors * 1.0 / t.total AS share,
             |  nn.olabel AS nn_label, nn.dist AS nn_dist
             |FROM st s CROSS JOIN tot t
             |  JOIN nn ON nn.clabel = s.clabel AND nn.rk = 1
             |ORDER BY s.clabel""".stripMargin)),

    // IVF recall curve — the parameter-selection audit that closes the ANN
    // family: measured recall@3 against the EXACT answer for
    // nprobe ∈ {1, 2, 4}, in ONE pass over a shared candidate frame. This
    // is the number an operator actually tunes nprobe with (s03/s08 gate
    // each setting's OUTPUT; d20/s12 audit LSH and int8-ADC the same way).
    // Shape: probe ranks ≤ 4 computed once (broadcast k×dim centroids, the
    // s03 path), candidates scored once, then a tiny 3-row levels dim
    // cross-joins in to rank each nprobe's admissible candidates — the
    // corpus is scanned once and the 3 curves share one exchange, vs 3×
    // the cost of running s03/s08 separately. Ground truth is the s01
    // brute-force top-3 on the SAME sampled query set: the audit is
    // O(|Q|·n) by construction, priced by sampling the queries (|Q| =
    // n/50 here) — at 100 TB recall is estimated on a query sample, never
    // the full corpus, and the curve transfers because recall depends on
    // the list/centroid geometry, not on which queries probe it. All
    // counts are integers and recall is one IEEE division, so both
    // engines agree bit-exactly.
    Q("s14_ivf_recall_curve",
      "measured recall@3 of IVF ANN vs exact top-3 for nprobe in {1,2,4}, one shared candidate pass",
      (s, d) => {
        import s.implicits._
        val e = Tables.embeddings(s, d)
        graft.plans.VectorExpressions.register(s)
        val v = e.select(col("vec_id"), col("label").cast("long").as("label"),
          vecD(col("embedding")).as("v"))
          .withColumn("nrm", sqrt(dotFast(col("v"), col("v"))))
        val cent = coarseCentroids(v, "label")
        val q = v.filter(col("vec_id") % 50 === 0 && col("vec_id") < 2000)
          .select(col("vec_id").as("query_id"), col("v").as("qv"),
            col("nrm").as("qn"))
        val wProbe = Window.partitionBy(col("query_id"))
          .orderBy(col("ccos").desc, col("label").asc)
        val probe = q.crossJoin(broadcast(cent))
          .withColumn("ccos",
            dotFast(col("qv"), col("cent")) / (col("qn") * col("cnrm")))
          .withColumn("probe_rank", row_number().over(wProbe))
          .filter(col("probe_rank") <= 4)
          .select(col("query_id"), col("qv"), col("qn"),
            col("label").as("probe_label"), col("probe_rank"))
        val scored = v.join(broadcast(probe), col("label") === col("probe_label"))
          .filter(col("vec_id") =!= col("query_id"))
          .withColumn("cosine",
            dotFast(col("v"), col("qv")) / (col("nrm") * col("qn")))
          .select(col("query_id"), col("vec_id").as("neighbor_id"),
            col("probe_rank"), col("cosine"))
        val levels = Seq(1, 2, 4).toDF("nprobe")
        val wTop = Window.partitionBy(col("query_id"), col("nprobe"))
          .orderBy(col("cosine").desc, col("neighbor_id").asc)
        val approx = scored
          .join(broadcast(levels), col("probe_rank") <= col("nprobe"))
          .withColumn("rank", row_number().over(wTop))
          .filter(col("rank") <= 3)
          .select(col("nprobe"), col("query_id"), col("neighbor_id"))
        val wT = Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("vec_id").asc)
        val truth = v.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("query_id"))
          .withColumn("cosine",
            dotFast(col("v"), col("qv")) / (col("nrm") * col("qn")))
          .withColumn("rank", row_number().over(wT))
          .filter(col("rank") <= 3)
          .select(col("query_id"), col("vec_id").as("neighbor_id"))
        val nq = truth.agg(
          countDistinct(col("query_id")).as("n_queries"),
          count(lit(1)).as("truth_rows"))
        // levels LEFT-join the hit counts: an nprobe setting with ZERO
        // hits must report recall = 0.0, not vanish from the curve —
        // the audit's contract is one row per audited setting
        val hits = approx.join(truth, Seq("query_id", "neighbor_id"), "left_semi")
          .groupBy("nprobe").agg(count(lit(1)).as("hits"))
        levels.join(hits, Seq("nprobe"), "left")
          .crossJoin(broadcast(nq))
          .select(col("nprobe"), col("n_queries"),
            coalesce(col("hits"), lit(0L)).as("hits"),
            // empty corpus → zero truth rows: recall is UNDEFINED (null),
            // not a crash — ANSI division would abort the whole audit on
            // the day a partition is empty (EmptyInputSweepSpec)
            when(col("truth_rows") === 0, lit(null))
              .otherwise(coalesce(col("hits"), lit(0L)) * lit(1.0)
                / col("truth_rows"))
              .as("recall"))
          .orderBy("nprobe")
      },
      Some(s"""$sqlVectors,
             |v AS (SELECT e2.vec_id, e2.label::BIGINT AS label, n.v, n.nrm
             |  FROM embeddings e2 JOIN n ON e2.vec_id = n.vec_id),
             |cent AS (SELECT label, ${sqlMeanList("v", Dim)} AS cent
             |  FROM v GROUP BY label),
             |centn AS (SELECT label, cent,
             |    sqrt(list_reduce(list_transform(range(1, ${Dim + 1}), i -> cent[i] * cent[i]),
             |      (x, y) -> x + y)) AS cnrm FROM cent),
             |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM v WHERE vec_id % 50 = 0 AND vec_id < 2000),
             |probe AS (SELECT query_id, qv, qn, label AS probe_label, crank AS probe_rank FROM (
             |    SELECT q.query_id, q.qv, q.qn, c.label,
             |      row_number() OVER (PARTITION BY q.query_id ORDER BY
             |        list_reduce(list_transform(range(1, ${Dim + 1}), i -> q.qv[i] * c.cent[i]), (x, y) -> x + y)
             |          / (q.qn * c.cnrm) DESC, c.label) AS crank
             |    FROM q CROSS JOIN centn c) WHERE crank <= 4),
             |scored AS (SELECT p.query_id, v.vec_id AS neighbor_id, p.probe_rank,
             |    list_reduce(list_transform(range(1, ${Dim + 1}), i -> v.v[i] * p.qv[i]), (x, y) -> x + y)
             |      / (v.nrm * p.qn) AS cosine
             |  FROM v JOIN probe p ON v.label = p.probe_label
             |  WHERE v.vec_id <> p.query_id),
             |lv AS (SELECT unnest([1, 2, 4]) AS nprobe),
             |approx AS (SELECT nprobe, query_id, neighbor_id FROM (
             |    SELECT l.nprobe, s.query_id, s.neighbor_id,
             |      row_number() OVER (PARTITION BY s.query_id, l.nprobe
             |        ORDER BY s.cosine DESC, s.neighbor_id) AS rank
             |    FROM scored s JOIN lv l ON s.probe_rank <= l.nprobe)
             |  WHERE rank <= 3),
             |truth AS (SELECT query_id, neighbor_id FROM (
             |    SELECT q.query_id, v.vec_id AS neighbor_id,
             |      row_number() OVER (PARTITION BY q.query_id ORDER BY
             |        list_reduce(list_transform(range(1, ${Dim + 1}), i -> v.v[i] * q.qv[i]), (x, y) -> x + y)
             |          / (v.nrm * q.qn) DESC, v.vec_id) AS rank
             |    FROM v CROSS JOIN q WHERE v.vec_id <> q.query_id)
             |  WHERE rank <= 3),
             |nq AS (SELECT count(DISTINCT query_id)::BIGINT AS n_queries,
             |    count(*)::BIGINT AS truth_rows FROM truth),
             |hits AS (SELECT a.nprobe, count(*)::BIGINT AS hits
             |  FROM approx a JOIN truth t
             |    ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id
             |  GROUP BY a.nprobe)
             |SELECT l.nprobe, nq.n_queries, coalesce(h.hits, 0)::BIGINT AS hits,
             |  CASE WHEN nq.truth_rows = 0 THEN NULL
             |    ELSE coalesce(h.hits, 0)::BIGINT * 1.0 / nq.truth_rows END AS recall
             |FROM lv l LEFT JOIN hits h ON l.nprobe = h.nprobe
             |  CROSS JOIN nq
             |ORDER BY l.nprobe""".stripMargin)),

    // Attribute-filtered vector search — the production question every
    // metadata-constrained retrieval system faces (FAISS IDSelector,
    // Milvus/Vespa filtered HNSW): given a predicate (here: same `label`
    // as the query), PRE-filtering searches only the satisfying subset
    // and is exact by construction, while POST-filtering takes the
    // global top-K and drops non-matching rows — cheap, but its recall
    // collapses as predicate selectivity shrinks (with ~1/10 selectivity
    // a global top-20 holds ~2 matching rows IF matches were random;
    // clustered embeddings do better exactly when label correlates with
    // geometry, and THIS query measures that on your corpus). Output
    // grain is the pre-filter truth top-3 per query with a post_hit
    // flag: did the global top-20 (the post-filter candidate pool)
    // contain this truth neighbor? sum(post_hit)/3 is recall@3-from-20.
    // Plan: ONE corpus×queries pass (queries broadcast, corpus never
    // reshuffles) feeding TWO windows — rank within the label-matching
    // rows and rank over all rows — that share a single query_id
    // exchange (HashPartitioning(query_id) satisfies both clusterings;
    // the s16 trick). The dual rank-filter keeps only rows either
    // ranking admits. At 100 TB the pre-filter leg is why vector stores
    // partition by hot metadata columns: label-bucketed storage turns
    // the truth leg into a pruned scan of 1/|labels| of the corpus,
    // while the post-filter leg is a full scan whatever the predicate.
    Q("s15_filtered_knn",
      "attribute-filtered ANN: exact same-label top-3 truth + did the global top-20 post-filter pool contain it",
      (s, d) => filteredTruth(s, d)
        .select(col("query_id"), col("rank_lab").as("rank"),
          col("vec_id").as("neighbor_id"),
          (col("rank_all") <= 20).as("post_hit"))
        .orderBy("query_id", "rank"),
      Some(s"""$sqlFilteredTruth
             |SELECT query_id, rank_lab AS rank, vec_id AS neighbor_id,
             |  rank_all <= 20 AS post_hit
             |FROM tr ORDER BY query_id, rank""".stripMargin)),

    // Matryoshka truncation audit — the fourth leg of the index-audit
    // family (d20 band geometry, s12 quantization loss, s13 list
    // balance, s16 DIMENSION truncation): recall@5 of searching on the
    // 16-dim PREFIX of each embedding vs exact full-dim search. MRL-
    // trained embeddings (Kusupati et al. 2022) put most signal in the
    // prefix dims precisely so retrieval can run at a fraction of the
    // memory/FLOPs — 16/64ths here — and THIS number is what that trade
    // costs on YOUR corpus; for non-MRL embeddings it measures how much
    // of the geometry the leading dims happen to carry. Same plan class
    // as s12: corpus never moves, the sampled query set broadcasts,
    // both rank windows share ONE query_id exchange, and the dual
    // rank-filter keeps only rows either ranking admits before the
    // per-query rollup.
    Q("s16_matryoshka_audit",
      "recall@5 of 16-dim-prefix search vs exact 64-dim search, sampled queries",
      (s, d) => {
        val pDim = 16
        val e = vectors(s, d)
          .withColumn("pv", slice(col("v"), 1, pDim))
          .withColumn("pnrm", sqrt(dotFast(col("pv"), col("pv"))))
        val q = e.filter(col("vec_id") % 50 === 0 && col("vec_id") < 2000)
          .select(col("vec_id").as("query_id"), col("v").as("qv"),
            col("nrm").as("qn"), col("pv").as("qpv"), col("pnrm").as("qpn"))
        val we = Window.partitionBy(col("query_id"))
          .orderBy(col("ce").desc, col("vec_id").asc)
        val wp = Window.partitionBy(col("query_id"))
          .orderBy(col("cp").desc, col("vec_id").asc)
        e.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("query_id"))
          .withColumn("ce", dotFast(col("v"), col("qv")) / (col("nrm") * col("qn")))
          .withColumn("cp", dotFast(col("pv"), col("qpv")) / (col("pnrm") * col("qpn")))
          .withColumn("rank_e", row_number().over(we))
          .withColumn("rank_p", row_number().over(wp))
          .filter(col("rank_e") <= 5 || col("rank_p") <= 5)
          .groupBy("query_id")
          .agg(sum(when(col("rank_e") <= 5 && col("rank_p") <= 5, 1L)
            .otherwise(0L)).as("n_common"))
          .withColumn("recall_at_5", col("n_common") * lit(1.0) / 5)
          .orderBy("query_id")
      },
      Some(s"""$sqlVectors,
             |p AS (SELECT vec_id, v, nrm, v[1:16] AS pv,
             |    sqrt(list_reduce(list_transform(range(1, 17),
             |      i -> v[i] * v[i]), (x, y) -> x + y)) AS pnrm
             |  FROM n),
             |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn,
             |    pv AS qpv, pnrm AS qpn
             |  FROM p WHERE vec_id % 50 = 0 AND vec_id < 2000),
             |sc AS (SELECT q.query_id, p.vec_id,
             |    list_reduce(list_transform(range(1, 65),
             |      i -> p.v[i] * q.qv[i]), (x, y) -> x + y) / (p.nrm * q.qn) AS ce,
             |    list_reduce(list_transform(range(1, 17),
             |      i -> p.pv[i] * q.qpv[i]), (x, y) -> x + y) / (p.pnrm * q.qpn) AS cp
             |  FROM p CROSS JOIN q WHERE p.vec_id <> q.query_id),
             |rk AS (SELECT query_id, vec_id,
             |    row_number() OVER (PARTITION BY query_id
             |      ORDER BY ce DESC, vec_id) AS rank_e,
             |    row_number() OVER (PARTITION BY query_id
             |      ORDER BY cp DESC, vec_id) AS rank_p
             |  FROM sc)
             |SELECT query_id,
             |  sum(CASE WHEN rank_e <= 5 AND rank_p <= 5 THEN 1 ELSE 0 END)::BIGINT
             |    AS n_common,
             |  sum(CASE WHEN rank_e <= 5 AND rank_p <= 5 THEN 1 ELSE 0 END)::BIGINT
             |    * 1.0 / 5 AS recall_at_5
             |FROM rk GROUP BY query_id ORDER BY query_id""".stripMargin)),

    // The tuning curve for s15's design question (the s14 discipline —
    // price the whole knob range from ONE shared pass, not one query
    // per setting): post-filtering over-retrieves a global top-K pool
    // and keeps predicate matches, so the ONLY production knob is K —
    // and this query measures recall@3-vs-truth for K ∈ {5,10,20,50}
    // against the exact same-label top-3. The knee of this curve is
    // what you ship; below it post-filtering silently loses neighbors,
    // above it you pay dead exact-distance work per query. Plan: s15's
    // single corpus×queries pass and shared query_id exchange, the
    // K levels join the truth rows as a broadcast 4-row frame, and the
    // rollup is 4 rows — the curve costs one s15, not four.
    Q("s17_filter_recall_curve",
      "post-filter recall@3 vs exact same-label truth for top-K pools, K in {5,10,20,50}, one shared pass",
      (s, d) => {
        import s.implicits._
        val levels = Seq(5, 10, 20, 50).toDF("k_pool")
        // denominators fold into the SAME 4-row aggregation (each truth
        // row appears once per level), so the corpus pass runs once —
        // no separate count branch re-scanning the pair space
        filteredTruth(s, d).crossJoin(broadcast(levels))
          .groupBy("k_pool")
          .agg(countDistinct(col("query_id")).as("n_queries"),
            count(lit(1)).as("truth_rows"),
            sum(when(col("rank_all") <= col("k_pool"), 1L).otherwise(0L))
              .as("hits"))
          .select(col("k_pool"), col("n_queries"), col("truth_rows"),
            col("hits"),
            when(col("truth_rows") === 0, lit(null))
              .otherwise(col("hits") * lit(1.0) / col("truth_rows"))
              .as("recall"))
          .orderBy("k_pool")
      },
      Some(s"""$sqlFilteredTruth,
             |lv AS (SELECT unnest([5, 10, 20, 50]) AS k_pool)
             |SELECT lv.k_pool::INT AS k_pool,
             |  count(DISTINCT tr.query_id)::BIGINT AS n_queries,
             |  count(*)::BIGINT AS truth_rows,
             |  sum(CASE WHEN tr.rank_all <= lv.k_pool THEN 1 ELSE 0 END)::BIGINT AS hits,
             |  CASE WHEN count(*) = 0 THEN NULL
             |    ELSE sum(CASE WHEN tr.rank_all <= lv.k_pool THEN 1 ELSE 0 END)
             |      * 1.0 / count(*) END AS recall
             |FROM tr CROSS JOIN lv
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Graph-ANN leg: one k-NN-DESCENT refinement round (Dong et al.,
    // WWW'11 — the build step HNSW/NSG-class graph indexes share) over
    // a TWO-TABLE LSH-seeded k-NN graph, audited against exact search.
    // Seed: each node's top-5 over the union of its bucket-mates in two
    // INDEPENDENT 4-plane sign tables (planes 0-3 and 4-7). Two tables
    // is load-bearing, not a recall tweak: with a single bucketing the
    // seed graph is bucket-LOCAL — every adjacency edge stays inside
    // its bucket, so neighbors-of-neighbors can never leave the query's
    // own bucket and one descent round is PROVABLY a no-op (measured
    // before the fix: zero candidates outside g0's own bucket). With
    // two tables a 2-hop path composes table A then table B and
    // escapes both partitions — the same reason multi-table LSH works.
    // Plane count is ADAPTIVE (knnDescentAudit): p = max(4,
    // ceil(log2(n/32))) holds bucket occupancy ~16–32 so the seed
    // self-join stays linear in the corpus; p = 4 exactly at the
    // sf0.01 gate, where this oracle's fixed planes 0–3 / 4–7 apply.
    Q("s18_knn_descent",
      "one k-NN-descent round over a two-table LSH-seeded 5-NN graph: per-query recall@5 vs exact, seed and refined",
      (s, d) => knnDescentAudit(vectors(s, d)),
      Some(s"""$sqlVectors,
             |$sqlBucket4,
             |p0 AS (SELECT s.vec_id AS src, t.vec_id AS dst,
             |    list_reduce(list_transform(range(1, 65), i -> s.v[i] * t.v[i]), (x, y) -> x + y)
             |      / (s.nrm * t.nrm) AS cosine
             |  FROM b4 s JOIN b4 t ON s.bucket_a = t.bucket_a AND s.vec_id <> t.vec_id
             |  UNION
             |  SELECT s.vec_id, t.vec_id,
             |    list_reduce(list_transform(range(1, 65), i -> s.v[i] * t.v[i]), (x, y) -> x + y)
             |      / (s.nrm * t.nrm)
             |  FROM b4 s JOIN b4 t ON s.bucket_b = t.bucket_b AND s.vec_id <> t.vec_id),
             |g0 AS (SELECT src, dst, cosine FROM (
             |    SELECT src, dst, cosine,
             |      row_number() OVER (PARTITION BY src ORDER BY cosine DESC, dst) AS rk
             |    FROM p0) WHERE rk <= 5),
             |rv AS (SELECT dst AS src, src AS dst FROM (
             |    SELECT src, dst,
             |      row_number() OVER (PARTITION BY dst ORDER BY cosine DESC, src) AS rrk
             |    FROM g0) WHERE rrk <= 5),
             |adj AS (SELECT src, dst FROM g0 UNION SELECT src, dst FROM rv),
             |non AS (SELECT DISTINCT a.src AS src, c.dst AS dst
             |  FROM adj a JOIN adj c ON a.dst = c.src WHERE a.src <> c.dst),
             |sc AS (SELECT non.src, non.dst,
             |    list_reduce(list_transform(range(1, 65), i -> s.v[i] * t.v[i]), (x, y) -> x + y)
             |      / (s.nrm * t.nrm) AS cosine
             |  FROM non JOIN n s ON non.src = s.vec_id JOIN n t ON non.dst = t.vec_id),
             |u AS (SELECT src, dst, max(cosine) AS cosine FROM (
             |    SELECT src, dst, cosine FROM g0
             |    UNION ALL SELECT src, dst, cosine FROM sc) GROUP BY 1, 2),
             |g1 AS (SELECT src, dst FROM (
             |    SELECT src, dst,
             |      row_number() OVER (PARTITION BY src ORDER BY cosine DESC, dst) AS rk
             |    FROM u) WHERE rk <= 5),
             |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n WHERE vec_id % 50 = 0 AND vec_id < 2000),
             |ex AS (SELECT query_id, vec_id AS tru FROM (
             |    SELECT q.query_id, n.vec_id,
             |      row_number() OVER (PARTITION BY q.query_id ORDER BY
             |        list_reduce(list_transform(range(1, 65), i -> n.v[i] * q.qv[i]), (x, y) -> x + y)
             |          / (n.nrm * q.qn) DESC, n.vec_id) AS rank
             |    FROM n CROSS JOIN q WHERE n.vec_id <> q.query_id) WHERE rank <= 5),
             |h0 AS (SELECT ex.query_id, count(*)::BIGINT AS n FROM ex
             |  JOIN g0 g ON ex.query_id = g.src AND ex.tru = g.dst GROUP BY 1),
             |h1 AS (SELECT ex.query_id, count(*)::BIGINT AS n FROM ex
             |  JOIN g1 g ON ex.query_id = g.src AND ex.tru = g.dst GROUP BY 1)
             |SELECT q.query_id,
             |  coalesce(h0.n, 0)::BIGINT AS n_init,
             |  coalesce(h1.n, 0)::BIGINT AS n_desc,
             |  coalesce(h0.n, 0) * 1.0 / 5 AS recall_init,
             |  coalesce(h1.n, 0) * 1.0 / 5 AS recall_desc
             |FROM q LEFT JOIN h0 ON q.query_id = h0.query_id
             |LEFT JOIN h1 ON q.query_id = h1.query_id
             |ORDER BY q.query_id""".stripMargin)),

    // Hybrid retrieval — reciprocal rank fusion (Cormack, Clarke &
    // Buettcher SIGIR'09) of the DENSE leg (s01's cosine top-20 over
    // `embeddings`) and the LEXICAL leg (t31's integer BM25 top-20 over
    // `documents`; vec_id and doc_id share a key space, TESTDATA.md).
    // RRF is THE production hybrid-search combiner (Elastic/OpenSearch/
    // Vespa all ship it) precisely because it fuses incomparable score
    // scales using only ranks: contribution 1/(60+rank) per leg, here
    // ×1e9 with floor division so the fused score is an integer sum —
    // bit-exact in both engines, no float fusion arithmetic at all.
    // Shape: each leg is output-bound (top-20 per query) BEFORE the
    // fusion join, so the full-outer join runs on ≤ 40·|queries| rows —
    // fusion cost is workload-sized, never corpus-sized; the legs
    // themselves carry s01's broadcast-queries and t31's inverted-index
    // probe. A doc found by only one leg keeps the other leg's rank
    // NULL (contribution 0) — the asymmetry the gate pins: rrf of a
    // both-legs doc strictly dominates a same-rank single-leg doc.
    Q("s19_hybrid_rrf",
      "hybrid search: integer reciprocal-rank fusion of cosine top-20 and BM25 top-20, fused top-10 per query",
      (s, d) => {
        val e = vectors(s, d)
        val q = e.filter(col("vec_id") % 50 === 0 && col("vec_id") < 2000)
          .select(col("vec_id").as("query_id"),
            col("v").as("qv"), col("nrm").as("qn"))
        val wv = Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("vec_id").asc)
        val vleg = e.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("query_id"))
          .withColumn("cosine",
            dotFast(col("v"), col("qv")) / (col("nrm") * col("qn")))
          .withColumn("vec_rank", row_number().over(wv))
          .filter(col("vec_rank") <= 20)
          .select(col("query_id"), col("vec_id").as("doc_id"),
            col("vec_rank").cast("long").as("vec_rank"))
        val wl = Window.partitionBy(col("query_id"))
          .orderBy(col("score").desc, col("doc_id").asc)
        val lleg = TextAnalysis.bm25Scored(s, d)
          .withColumn("lex_rank", row_number().over(wl))
          .filter(col("lex_rank") <= 20)
          .select(col("query_id"), col("doc_id"),
            col("lex_rank").cast("long").as("lex_rank"))
        val wf = Window.partitionBy(col("query_id"))
          .orderBy(col("rrf").desc, col("doc_id").asc)
        vleg.join(lleg, Seq("query_id", "doc_id"), "full_outer")
          .withColumn("rrf",
            coalesce(expr("1000000000 div (60 + vec_rank)"), lit(0L)) +
              coalesce(expr("1000000000 div (60 + lex_rank)"), lit(0L)))
          .withColumn("rank", row_number().over(wf))
          .filter(col("rank") <= 10)
          .select(col("query_id"), col("rank").cast("long").as("rank"),
            col("doc_id"), col("rrf"), col("vec_rank"), col("lex_rank"))
          .orderBy("query_id", "rank")
      },
      Some(s"""$sqlVectors,
             |${TextAnalysis.sqlBm25Ag},
             |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n
             |  WHERE vec_id % 50 = 0 AND vec_id < 2000),
             |vs AS (SELECT q.query_id, n.vec_id AS doc_id,
             |    row_number() OVER (PARTITION BY q.query_id ORDER BY
             |      list_reduce(list_transform(range(1, 65), i -> n.v[i] * q.qv[i]), (x, y) -> x + y)
             |        / (n.nrm * q.qn) DESC, n.vec_id) AS vec_rank
             |  FROM n CROSS JOIN q WHERE n.vec_id <> q.query_id),
             |vleg AS (SELECT query_id, doc_id, vec_rank::BIGINT AS vec_rank
             |  FROM vs WHERE vec_rank <= 20),
             |lrk AS (SELECT query_id, doc_id, row_number() OVER (
             |    PARTITION BY query_id ORDER BY score DESC, doc_id) AS lex_rank FROM bag),
             |lleg AS (SELECT query_id, doc_id, lex_rank::BIGINT AS lex_rank
             |  FROM lrk WHERE lex_rank <= 20),
             |fz AS (SELECT coalesce(v.query_id, l.query_id) AS query_id,
             |    coalesce(v.doc_id, l.doc_id) AS doc_id, v.vec_rank, l.lex_rank,
             |    coalesce(1000000000 // (60 + v.vec_rank), 0)
             |      + coalesce(1000000000 // (60 + l.lex_rank), 0) AS rrf
             |  FROM vleg v FULL OUTER JOIN lleg l
             |    ON v.query_id = l.query_id AND v.doc_id = l.doc_id),
             |fr AS (SELECT *, row_number() OVER (PARTITION BY query_id
             |    ORDER BY rrf DESC, doc_id) AS rank FROM fz)
             |SELECT query_id, rank, doc_id, rrf::BIGINT AS rrf, vec_rank, lex_rank
             |FROM fr WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin)),

    // Two-stage retrieve-then-rerank — THE production vector-serving
    // shape (every deployed ANN system is a funnel: a cheap screen over
    // the whole corpus, an exact rerank over the fetched candidates):
    // stage 1 scores the 16-dim matryoshka PREFIX (s16's cheap scorer —
    // ¼ the FLOPs and bytes per corpus row; in a columnar store the
    // prefix dims prune at the scan) and keeps top-50 per query; stage 2
    // FETCHES full 64-dim vectors for candidates only (the broadcast
    // equi-join back to the corpus — the "fetch" of a serving stack) and
    // reranks by exact full-dim cosine to top-10. Both stages are
    // deterministic IEEE chains (dotFast's left fold, vec_id tiebreaks),
    // so the whole funnel is hash-gated — and `stage1_rank` rides along,
    // making the reorder the rerank buys VISIBLE in the gated output
    // (rows where rank ≠ stage1-order are the funnel's value; s16
    // already prices what the prefix screen loses, recall 0.4@5).
    // Scale shape: stage 1 is the one corpus-scale pass (broadcast
    // queries, corpus never reshuffles — s01's discipline at ¼ width);
    // everything after the WindowGroupLimit is candidate-sized:
    // the candidate set (≤ 50·|queries| rows, output-bound) broadcasts
    // into the fetch join, the corpus side streams with zero shuffle.
    Q("s20_two_stage_rerank",
      "two-stage serving funnel: 16-dim prefix screen to top-50, exact full-dim rerank of fetched candidates to top-10",
      (s, d) => {
        val pDim = 16
        val e = vectors(s, d)
        val ep = e.select(col("vec_id"), slice(col("v"), 1, pDim).as("pv"))
          .withColumn("pnrm", sqrt(dotFast(col("pv"), col("pv"))))
        val q = e.filter(col("vec_id") % 50 === 0 && col("vec_id") < 2000)
          .withColumn("pv", slice(col("v"), 1, pDim))
          .withColumn("pnrm", sqrt(dotFast(col("pv"), col("pv"))))
          .select(col("vec_id").as("query_id"), col("v").as("qv"),
            col("nrm").as("qn"), col("pv").as("qpv"), col("pnrm").as("qpn"))
        val w1 = Window.partitionBy(col("query_id"))
          .orderBy(col("cp").desc, col("vec_id").asc)
        val cand = ep
          .crossJoin(broadcast(q.select("query_id", "qpv", "qpn")))
          .filter(col("vec_id") =!= col("query_id"))
          .withColumn("cp",
            dotFast(col("pv"), col("qpv")) / (col("pnrm") * col("qpn")))
          .withColumn("stage1_rank", row_number().over(w1))
          .filter(col("stage1_rank") <= 50)
          .select(col("query_id"), col("vec_id"),
            col("stage1_rank").cast("long").as("stage1_rank"))
        val w2 = Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("vec_id").asc)
        e.join(broadcast(cand), Seq("vec_id"))
          .join(broadcast(q.select("query_id", "qv", "qn")), Seq("query_id"))
          .withColumn("cosine",
            dotFast(col("v"), col("qv")) / (col("nrm") * col("qn")))
          .withColumn("rank", row_number().over(w2))
          .filter(col("rank") <= 10)
          .select(col("query_id"), col("rank").cast("long").as("rank"),
            col("vec_id"), col("cosine"), col("stage1_rank"))
          .orderBy("query_id", "rank")
      },
      Some(s"""$sqlVectors,
             |p AS (SELECT vec_id, v, nrm, v[1:16] AS pv,
             |    sqrt(list_reduce(list_transform(range(1, 17),
             |      i -> v[i] * v[i]), (x, y) -> x + y)) AS pnrm
             |  FROM n),
             |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn,
             |    pv AS qpv, pnrm AS qpn
             |  FROM p WHERE vec_id % 50 = 0 AND vec_id < 2000),
             |s1 AS (SELECT q.query_id, p.vec_id,
             |    row_number() OVER (PARTITION BY q.query_id ORDER BY
             |      list_reduce(list_transform(range(1, 17),
             |        i -> p.pv[i] * q.qpv[i]), (x, y) -> x + y)
             |        / (p.pnrm * q.qpn) DESC, p.vec_id) AS stage1_rank
             |  FROM p CROSS JOIN q WHERE p.vec_id <> q.query_id),
             |cand AS (SELECT query_id, vec_id, stage1_rank::BIGINT AS stage1_rank
             |  FROM s1 WHERE stage1_rank <= 50),
             |s2 AS (SELECT c.query_id, c.vec_id, c.stage1_rank,
             |    list_reduce(list_transform(range(1, 65),
             |      i -> p.v[i] * q.qv[i]), (x, y) -> x + y) / (p.nrm * q.qn)
             |      AS cosine
             |  FROM cand c JOIN p ON c.vec_id = p.vec_id
             |  JOIN q ON c.query_id = q.query_id),
             |rr AS (SELECT *, row_number() OVER (PARTITION BY query_id
             |    ORDER BY cosine DESC, vec_id) AS rank FROM s2)
             |SELECT query_id, rank::BIGINT AS rank, vec_id, cosine, stage1_rank
             |FROM rr WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin)),

    // The funnel's tuning curve — s20's design question priced the s17
    // way (s17 prices s15's over-retrieve pool; this prices s20's):
    // recall@10 of the two-stage funnel vs exact full-dim truth for
    // stage-1 pools K ∈ {10, 20, 50}. Because stage 2 reranks EXACTLY,
    // the funnel's final top-10 at pool K is precisely the exact top-10
    // restricted to the stage-1 top-K — so recall@10 = |exact top-10 ∩
    // prefix top-K| / 10, an integer intersection count (hash-gated;
    // the one division is a single IEEE op). K = 50 reconciles against
    // s20's ACTUAL output row-for-row (spec), the s17 "curve meets the
    // operator" move. Scale shape: the s16 one-shared-pass discipline —
    // prefix and exact cosines ride ONE corpus×queries pass, both rank
    // windows share the query_id exchange, truth rows (≤ 10·|queries|)
    // cross the broadcast 3-row level table and fold into one 3-row
    // aggregation.
    Q("s21_rerank_recall_curve",
      "two-stage funnel recall@10 vs exact truth for stage-1 pools K in {10,20,50}, one shared pass",
      (s, d) => {
        import s.implicits._
        val pDim = 16
        val e = vectors(s, d)
          .withColumn("pv", slice(col("v"), 1, pDim))
          .withColumn("pnrm", sqrt(dotFast(col("pv"), col("pv"))))
        val q = e.filter(col("vec_id") % 50 === 0 && col("vec_id") < 2000)
          .select(col("vec_id").as("query_id"), col("v").as("qv"),
            col("nrm").as("qn"), col("pv").as("qpv"), col("pnrm").as("qpn"))
        val we = Window.partitionBy(col("query_id"))
          .orderBy(col("ce").desc, col("vec_id").asc)
        val wp = Window.partitionBy(col("query_id"))
          .orderBy(col("cp").desc, col("vec_id").asc)
        val levels = Seq(10, 20, 50).toDF("k_pool")
        e.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("query_id"))
          .withColumn("ce", dotFast(col("v"), col("qv")) / (col("nrm") * col("qn")))
          .withColumn("cp", dotFast(col("pv"), col("qpv")) / (col("pnrm") * col("qpn")))
          .withColumn("rank_e", row_number().over(we))
          .withColumn("rank_p", row_number().over(wp))
          .filter(col("rank_e") <= 10)
          .crossJoin(broadcast(levels))
          .groupBy("k_pool")
          .agg(countDistinct(col("query_id")).as("n_queries"),
            count(lit(1)).as("truth_rows"),
            sum(when(col("rank_p") <= col("k_pool"), 1L).otherwise(0L))
              .as("hits"))
          .select(col("k_pool"), col("n_queries"), col("truth_rows"),
            col("hits"),
            (col("hits") * lit(1.0) / col("truth_rows")).as("recall_at_10"))
          .orderBy("k_pool")
      },
      Some(s"""$sqlVectors,
             |p AS (SELECT vec_id, v, nrm, v[1:16] AS pv,
             |    sqrt(list_reduce(list_transform(range(1, 17),
             |      i -> v[i] * v[i]), (x, y) -> x + y)) AS pnrm
             |  FROM n),
             |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn,
             |    pv AS qpv, pnrm AS qpn
             |  FROM p WHERE vec_id % 50 = 0 AND vec_id < 2000),
             |sc AS (SELECT q.query_id, p.vec_id,
             |    list_reduce(list_transform(range(1, 65),
             |      i -> p.v[i] * q.qv[i]), (x, y) -> x + y) / (p.nrm * q.qn) AS ce,
             |    list_reduce(list_transform(range(1, 17),
             |      i -> p.pv[i] * q.qpv[i]), (x, y) -> x + y) / (p.pnrm * q.qpn) AS cp
             |  FROM p CROSS JOIN q WHERE p.vec_id <> q.query_id),
             |rk AS (SELECT query_id, vec_id,
             |    row_number() OVER (PARTITION BY query_id
             |      ORDER BY ce DESC, vec_id) AS rank_e,
             |    row_number() OVER (PARTITION BY query_id
             |      ORDER BY cp DESC, vec_id) AS rank_p
             |  FROM sc),
             |tr AS (SELECT * FROM rk WHERE rank_e <= 10),
             |lv AS (SELECT unnest([10, 20, 50]) AS k_pool)
             |SELECT lv.k_pool::INT AS k_pool,
             |  count(DISTINCT tr.query_id)::BIGINT AS n_queries,
             |  count(*)::BIGINT AS truth_rows,
             |  sum(CASE WHEN tr.rank_p <= lv.k_pool THEN 1 ELSE 0 END)::BIGINT AS hits,
             |  sum(CASE WHEN tr.rank_p <= lv.k_pool THEN 1 ELSE 0 END)
             |    * 1.0 / count(*) AS recall_at_10
             |FROM tr CROSS JOIN lv
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // RANGE (radius) search — the second vector-DB query API beside
    // top-k: every neighbor with cosine >= τ, answer-set size
    // data-dependent (Milvus/Faiss `range_search`). The production
    // path is the multi-probe LSH screen (s05's 9-bucket probe set —
    // the corpus never reshuffles, probes ride a broadcast); the audit
    // leg here scores the screen against the exact range set per
    // query: one corpus×queries broadcast pass (fixed workload — the
    // pinned id-window discipline), membership of each true neighbor's
    // bucket in the query's probe array, counts at query grain. At
    // 100 TB the truth leg is the auditor's sampled job (d28's
    // rationale); the screened path is the serving plan. τ = 0.3 sits
    // at the ~99th cosine percentile of the unstructured fixture
    // vectors, so range sets are small but non-empty at every SF.
    Q("s22_range_search",
      "cosine range search (τ = 0.3): exact range set vs the 9-probe LSH screen, per-query found/missed audit",
      (s, d) => {
        val e = vectors(s, d).withColumn("bucket", bucketCol(col("v")))
        val q0 = e.filter(col("vec_id") % 50 === 0 && col("vec_id") < 2000)
          .select(col("vec_id").as("query_id"), col("v").as("qv"),
            col("nrm").as("qn"), col("bucket").as("qbucket"))
        val probes = q0.select(col("query_id"), array(
          col("qbucket") +: (0 until 8).map(j =>
            col("qbucket").bitwiseXOR(lit(1L << j))): _*).as("parr"))
        val truth = e
          .crossJoin(broadcast(q0.select("query_id", "qv", "qn")))
          .filter(col("vec_id") =!= col("query_id"))
          .withColumn("cosine",
            dotFast(col("v"), col("qv")) / (col("nrm") * col("qn")))
          .filter(col("cosine") >= 0.3)
          .select(col("query_id"), col("vec_id"), col("bucket"))
        val ag = truth.join(broadcast(probes), Seq("query_id"))
          .withColumn("hit", array_contains(col("parr"), col("bucket")))
          .groupBy("query_id")
          .agg(count(lit(1)).as("n_true"),
            sum(when(col("hit"), 1L).otherwise(0L)).as("n_found"))
        q0.select("query_id").join(ag, Seq("query_id"), "left")
          .select(col("query_id"),
            coalesce(col("n_true"), lit(0L)).as("n_true"),
            coalesce(col("n_found"), lit(0L)).as("n_found"),
            (coalesce(col("n_true"), lit(0L)) -
              coalesce(col("n_found"), lit(0L))).as("n_missed"),
            when(col("n_true") > 0L,
              expr("(n_found * 100) div n_true")).as("found_pct"))
          .orderBy("query_id")
      },
      Some(s"""$sqlVectors,
             |$sqlBucket,
             |q0 AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn, bucket AS qbucket
             |  FROM b WHERE vec_id % 50 = 0 AND vec_id < 2000),
             |pr AS (SELECT query_id, list_prepend(qbucket,
             |    list_transform(range(0, 8), j -> xor(qbucket, CAST(power(2, j) AS BIGINT)))) AS parr
             |  FROM q0),
             |tr AS (SELECT q0.query_id, b.vec_id, b.bucket
             |  FROM b CROSS JOIN q0
             |  WHERE b.vec_id <> q0.query_id
             |    AND list_reduce(list_transform(range(1, 65), i -> b.v[i] * q0.qv[i]),
             |      (x, y) -> x + y) / (b.nrm * q0.qn) >= 0.3),
             |ag AS (SELECT tr.query_id, count(*)::BIGINT AS n_true,
             |    sum(CASE WHEN list_contains(pr.parr, tr.bucket) THEN 1 ELSE 0 END)::BIGINT AS n_found
             |  FROM tr JOIN pr USING (query_id) GROUP BY 1)
             |SELECT q0.query_id, coalesce(ag.n_true, 0)::BIGINT AS n_true,
             |  coalesce(ag.n_found, 0)::BIGINT AS n_found,
             |  (coalesce(ag.n_true, 0) - coalesce(ag.n_found, 0))::BIGINT AS n_missed,
             |  CASE WHEN ag.n_true > 0 THEN (ag.n_found * 100) // ag.n_true END AS found_pct
             |FROM q0 LEFT JOIN ag USING (query_id)
             |ORDER BY q0.query_id""".stripMargin)),

    // HARD-NEGATIVE mining — the training-pair op contrastive retrieval
    // training runs between indexing and the loader (DPR/ANCE: negatives
    // that the current embedding space ranks HIGH but that are not
    // positives are the informative gradient signal; random negatives
    // are too easy, near-positives are label noise). Per pinned query:
    // corpus vectors inside the cosine band [0.25, 0.40) — above the
    // random-similarity floor (this corpus's off-pair cosines center at
    // ~0.003), below the positive threshold (the ANCE false-negative
    // exclusion; s22's range-search radius 0.3 sits inside the band) —
    // ranked by cosine desc, top-5. Thresholds are corpus-calibrated
    // config in production (median random similarity vs the dedup
    // threshold); fixed constants here, the m01/t29 stand-in rule.
    // Scale shape: s01's exactness-baseline pass — the pinned query set
    // broadcasts, ONE corpus scan scores codegen'd dots, and the band
    // filter runs BEFORE the per-query window so the top-k buffers see
    // band-sized input, compiling to WindowGroupLimit. At 100 TB the
    // scale path is the ANCE loop itself: mine from the ANN index
    // (s03/s20's funnel) and accept screen recall, exactly the
    // documented s20 trade — the exact pass is the recall yardstick.
    Q("s23_hard_negatives",
      "contrastive hard-negative mining: top-5 per query inside the cosine band [0.25, 0.40) — informative but not near-positive",
      (s, d) => {
        val e = vectors(s, d)
        val q = e.filter(col("vec_id") % 50 === 0 && col("vec_id") < 2000)
          .select(col("vec_id").as("query_id"), col("v").as("qv"),
            col("nrm").as("qn"))
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("vec_id").asc)
        e.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("query_id"))
          .withColumn("cosine",
            dotFast(col("v"), col("qv")) / (col("nrm") * col("qn")))
          .filter(col("cosine") >= 0.25 && col("cosine") < 0.40)
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
          .select(col("query_id"), col("rank"),
            col("vec_id").as("negative_id"), col("cosine"))
          .orderBy("query_id", "rank")
      },
      Some(s"""$sqlVectors,
             |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n
             |  WHERE vec_id % 50 = 0 AND vec_id < 2000),
             |scored AS (
             |  SELECT q.query_id, n.vec_id AS negative_id,
             |    list_reduce(list_transform(range(1, 65), i -> n.v[i] * q.qv[i]), (x, y) -> x + y)
             |      / (n.nrm * q.qn) AS cosine
             |  FROM n CROSS JOIN q WHERE n.vec_id <> q.query_id),
             |banded AS (SELECT * FROM scored
             |  WHERE cosine >= 0.25 AND cosine < 0.40),
             |ranked AS (SELECT query_id, negative_id, cosine,
             |  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, negative_id) AS rank
             |FROM banded)
             |SELECT query_id, rank, negative_id, cosine FROM ranked
             |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),

    // CENTROID-store drift audit — the d30/t40 nightly-reconciliation
    // discipline completed for the third persisted sidecar family: the
    // s09/s10 centroid index is only correct while the vectors it
    // summarizes don't move under it, and because the store keeps exact
    // sufficient statistics (per-dim DECIMAL sums + member count, the
    // s10 contract), drift detection is EXACT integer/decimal
    // comparison, not a float tolerance: recompute the stats from the
    // current corpus and compare cell by cell. Deletion drift stands in
    // deterministically (stored-slice members with vec_id ≡ 11 mod 13
    // in labels ≡ 2 mod 3 removed — the m01/t29 stand-in rule), so
    // labels 2/5/8 must read `drifted` (with ~all 64 sums moved) and
    // the rest `consistent`; a label missing from either side would
    // read orphaned/missing, the d30 verdict classes. Scale shape: the
    // store enters as a k-row SCAN; the fresh side is ONE corpus pass
    // collapsing map-side to k×64 decimal cells; the reconciliation
    // join runs at label grain. Stored vectors are never re-read by
    // the index itself — this audit is exactly the one corpus pass a
    // nightly job pays to certify that.
    Q("s24_centroid_drift",
      "centroid-store drift audit: exact decimal-statistics reconciliation per label — consistent / drifted / orphaned / missing",
      (s, d) => {
        graft.plans.VectorExpressions.register(s)
        val stored = s.read.parquet(centroidStore(s, d))
          .select(col("clabel") +:
            ((1 to Dim).map(i => col(s"s_$i").as(s"st_$i")) :+
              col("cnt").as("stored_cnt")): _*)
        val cur = centroidStats(
          Tables.embeddings(s, d)
            .filter(!(col("vec_id") % 5 === 4))
            .filter(!(col("vec_id") % 13 === 11 && col("label") % 3 === 2))
            .select(col("label").cast("long").as("clabel"),
              vecD(col("embedding")).as("v")), "clabel")
          .select(col("clabel") +:
            ((1 to Dim).map(i => col(s"s_$i").as(s"cu_$i")) :+
              col("cnt").as("current_cnt")): _*)
        val nDrift = (1 to Dim).map(i =>
          when(col(s"st_$i") =!= col(s"cu_$i"), lit(1L)).otherwise(lit(0L)))
          .reduce(_ + _)
        stored.join(cur, Seq("clabel"), "full_outer")
          .select(col("clabel"),
            when(col("stored_cnt").isNull, "missing")
              .when(col("current_cnt").isNull, "orphaned")
              .when(col("stored_cnt") === col("current_cnt") &&
                nDrift === 0L, "consistent")
              .otherwise("drifted").as("status"),
            col("stored_cnt"), col("current_cnt"),
            when(col("stored_cnt").isNotNull && col("current_cnt").isNotNull,
              nDrift).as("n_dims_drifted"))
          .orderBy("clabel")
      },
      Some(s"""WITH idx AS (SELECT unnest(range(1, ${Dim + 1})) AS dim),
             |v AS (SELECT vec_id, label::BIGINT AS clabel,
             |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
             |  FROM embeddings),
             |stc AS (SELECT clabel, count(*)::BIGINT AS stored_cnt FROM v
             |  WHERE vec_id % 5 <> 4 GROUP BY 1),
             |sts AS (SELECT clabel, dim,
             |    sum(CAST(v[dim] AS VARCHAR)::DECIMAL(18,9))::DECIMAL(30,9) AS s
             |  FROM v CROSS JOIN idx WHERE vec_id % 5 <> 4 GROUP BY 1, 2),
             |cuc AS (SELECT clabel, count(*)::BIGINT AS current_cnt FROM v
             |  WHERE vec_id % 5 <> 4
             |    AND NOT (vec_id % 13 = 11 AND clabel % 3 = 2) GROUP BY 1),
             |cus AS (SELECT clabel, dim,
             |    sum(CAST(v[dim] AS VARCHAR)::DECIMAL(18,9))::DECIMAL(30,9) AS s
             |  FROM v CROSS JOIN idx WHERE vec_id % 5 <> 4
             |    AND NOT (vec_id % 13 = 11 AND clabel % 3 = 2) GROUP BY 1, 2),
             |dims AS (SELECT s.clabel,
             |    sum(CASE WHEN s.s <> c.s THEN 1 ELSE 0 END)::BIGINT AS nd
             |  FROM sts s JOIN cus c ON s.clabel = c.clabel AND s.dim = c.dim
             |  GROUP BY 1)
             |SELECT coalesce(sc.clabel, cc.clabel) AS clabel,
             |  CASE WHEN sc.stored_cnt IS NULL THEN 'missing'
             |       WHEN cc.current_cnt IS NULL THEN 'orphaned'
             |       WHEN sc.stored_cnt = cc.current_cnt
             |        AND coalesce(d.nd, 0) = 0 THEN 'consistent'
             |       ELSE 'drifted' END AS status,
             |  sc.stored_cnt, cc.current_cnt,
             |  CASE WHEN sc.stored_cnt IS NOT NULL
             |        AND cc.current_cnt IS NOT NULL
             |    THEN coalesce(d.nd, 0) END AS n_dims_drifted
             |FROM stc sc FULL OUTER JOIN cuc cc ON sc.clabel = cc.clabel
             |  LEFT JOIN dims d ON coalesce(sc.clabel, cc.clabel) = d.clabel
             |ORDER BY clabel""".stripMargin)),

    // MULTI-ROUND k-NN descent — the rounds-to-convergence index BUILD
    // s18's single-round audit prices one step of (Dong et al. WWW'11
    // iterates until no edge changes; HNSW/NSG builds do the
    // equivalent): three descent rounds from the same two-table LSH
    // seed, each round the IDENTICAL extracted plan
    // ([[descentRound]] — undirect, 2-hop compose, score, re-top-K,
    // per-round localCheckpoint), reported per (query, round) as hits
    // against the exact top-5. Monotone per query at every round by
    // the superset argument (a true top-5 neighbor can be displaced
    // only by >4 strictly-better candidates, which cannot exist);
    // STRICT progress across rounds is the planted-cluster spec's
    // claim, not the gate's — on real data later rounds saturate,
    // which this curve prices (the s14/s17 one-pass-whole-knob-range
    // discipline, here for the round count: where recall plateaus is
    // where a production build stops). Oracle: the identical three
    // rounds unrolled as CTE stages.
    Q("s25_knn_descent_rounds",
      "3 k-NN-descent rounds from the LSH seed: per-(query, round) hits vs exact top-5 — the build's convergence curve",
      (s, d) => {
        val rounds = 3
        knnDescentRoundsAudit(vectors(s, d), rounds)
          .select(col("query_id"), col("round"), col("n_hits"),
            (col("n_hits") * lit(1.0) / 5).as("recall"))
          .orderBy("query_id", "round")
      },
      Some(s"""$sqlVectors,
             |$sqlBucket4,
             |p0 AS (SELECT s.vec_id AS src, t.vec_id AS dst,
             |    list_reduce(list_transform(range(1, 65), i -> s.v[i] * t.v[i]), (x, y) -> x + y)
             |      / (s.nrm * t.nrm) AS cosine
             |  FROM b4 s JOIN b4 t ON s.bucket_a = t.bucket_a AND s.vec_id <> t.vec_id
             |  UNION
             |  SELECT s.vec_id, t.vec_id,
             |    list_reduce(list_transform(range(1, 65), i -> s.v[i] * t.v[i]), (x, y) -> x + y)
             |      / (s.nrm * t.nrm)
             |  FROM b4 s JOIN b4 t ON s.bucket_b = t.bucket_b AND s.vec_id <> t.vec_id),
             |g0 AS (SELECT src, dst, cosine FROM (
             |    SELECT src, dst, cosine,
             |      row_number() OVER (PARTITION BY src ORDER BY cosine DESC, dst) AS rk
             |    FROM p0) WHERE rk <= 5)${sqlDescentRounds(3)},
             |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n WHERE vec_id % 50 = 0 AND vec_id < 2000),
             |ex AS (SELECT query_id, vec_id AS tru FROM (
             |    SELECT q.query_id, n.vec_id,
             |      row_number() OVER (PARTITION BY q.query_id ORDER BY
             |        list_reduce(list_transform(range(1, 65), i -> n.v[i] * q.qv[i]), (x, y) -> x + y)
             |          / (n.nrm * q.qn) DESC, n.vec_id) AS rank
             |    FROM n CROSS JOIN q WHERE n.vec_id <> q.query_id) WHERE rank <= 5),
             |hh AS (${(0 to 3).map(i =>
                s"SELECT $i::BIGINT AS round, ex.query_id, count(*)::BIGINT AS n " +
                  s"FROM ex JOIN g$i g ON ex.query_id = g.src AND ex.tru = g.dst GROUP BY 2")
                .mkString("\n  UNION ALL\n  ")}),
             |rd AS (SELECT unnest([0, 1, 2, 3]) AS round)
             |SELECT q.query_id, rd.round::BIGINT AS round,
             |  coalesce(hh.n, 0)::BIGINT AS n_hits,
             |  coalesce(hh.n, 0) * 1.0 / 5 AS recall
             |FROM q CROSS JOIN rd
             |LEFT JOIN hh ON hh.query_id = q.query_id AND hh.round = rd.round
             |ORDER BY q.query_id, round""".stripMargin),
      // the adaptive-plane count() makes `.schema` execute a corpus pass
      staticSchema = Some(org.apache.spark.sql.types.StructType.fromDDL(
        "query_id BIGINT, round BIGINT, n_hits BIGINT, recall DOUBLE"))),

    // ITERATED LLOYD TRAINING (spherical k-means — Dhillon & Modha,
    // Mach. Learn. 42, 2001) — the clustering leg of the registry's
    // iterated-training triad (t42 recounts BPE pair statistics after
    // every adopted merge; s25 re-tops the descent graph each round):
    // s04 grades ONE assignment step and s10 ONE centroid fold, but a
    // real quantizer build ITERATES — assign under the current
    // centroids, recompute exact means, repeat — so round r's centroids
    // depend on every earlier round. Per round the corpus is touched in
    // EXACTLY ONE shuffle-free pass: the ≤k centroids collect to the
    // driver (k×dim doubles — bounded, the d09 convergence-probe
    // discipline) and re-enter as array LITERALS, so assignment is k
    // codegen'd dots against constants with an array_position argmax
    // (ties → lowest cluster id, the oracle's row_number tiebreak), and
    // the round's single map-side-partial agg carries the cluster size,
    // the arrivals count (this round's label ≠ last round's — BOTH
    // labels computed from literal centroid sets inside the same pass,
    // so no corpus-sized state survives between rounds), and the next
    // centroids' DECIMAL(18,9) sufficient statistics. That scale is
    // centroidStats' bound: the decimal→double cast is single-rounded
    // in BOTH engines, so round-r centroids are BIT-EQUAL cross-engine
    // and float divergence cannot compound across rounds — the property
    // that makes an iterated float pipeline hash-gateable at all.
    // Seeds are Forgy (the k lowest vec_ids' own vectors — both engines
    // read them verbatim). At 100 TB: R passes over a corpus that never
    // shuffles and never broadcasts, k×dim bytes of driver state — the
    // textbook distributed Lloyd shape. Cosine is scale-invariant, so
    // assignment against the unnormalized mean equals the spherical
    // normalized-mean update and the assignment-time objective
    // Σ max-cosine is non-decreasing round over round;
    // KmeansLloydSpec asserts that curve and that round 2 genuinely
    // reassigns vectors on the fixture (non-vacuity: the iterated
    // build differs from s04's one-shot).
    Q("s26_kmeans_lloyd_rounds",
      "3 spherical Lloyd rounds from Forgy seeds: per-(round, cluster) size + arrivals via literal-centroid passes, exact decimal centroid sums — the quantizer build curve",
      (s, d) => lloydRounds(vectors(s, d), k = 8, rounds = 3)._1,
      Some(s"""$sqlVectors,
             |sd AS (SELECT vec_id, v, nrm FROM n ORDER BY vec_id LIMIT 8),
             |c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS clabel,
             |    v AS cent, nrm AS cnrm FROM sd)${sqlLloydRounds(3)},
             |rep AS (SELECT * FROM r1 UNION ALL SELECT * FROM r2
             |  UNION ALL SELECT * FROM r3)
             |SELECT round, clabel, n, moved_in FROM rep
             |ORDER BY round, clabel""".stripMargin),
      // driver-side loop: constructing the plan runs the per-round collects
      staticSchema = Some(org.apache.spark.sql.types.StructType.fromDDL(
        "round BIGINT, clabel BIGINT, n BIGINT, moved_in BIGINT"))),

    // PQ CODEBOOK TRAINING (product quantization — Jégou, Douze &
    // Schmid, TPAMI 2011 §III: independent k-means per subspace) — the
    // missing BUILD step of the registry's PQ lifecycle: s06/s07
    // quantize and search against FIXED codebooks, s11/s12 grade the
    // scalar-quantizer leg, s26 the full-dimension clustering loop;
    // this row trains the per-subspace codebooks themselves. Each
    // vector splits into M=4 contiguous 16-dim subvectors and each
    // subspace runs its OWN iterated L2 Lloyd (assignment by
    // argmin |x−c|² ⇔ argmax x·c − ½|c|², ties → lowest codeword — the
    // s26 row_number tiebreak), because PQ's whole premise is that the
    // product of M small codebooks spans k^M cells no single k-means
    // could afford. One corpus pass per round covers ALL subspaces:
    // the exploded (vec_id, sub, subvector) frame — same total bytes
    // as the corpus — is scored against M×k LITERAL centroids (the
    // ≤ k×dim driver-state discipline of s26; ½|c|² is driver-folded
    // in index order, the oracle's list_reduce twin), and the round's
    // single map-side-partial agg per (sub, codeword) carries size,
    // arrivals, and the next centroids' DECIMAL(18,9) sufficient
    // statistics — so round-r codebooks are BIT-EQUAL cross-engine and
    // float divergence cannot compound (centroidStats' bound). Seeds
    // are Forgy: the k lowest vec_ids' own subvectors, per subspace.
    // At 100 TB: R passes over a corpus that never shuffles and never
    // broadcasts, M×k×16 doubles of driver state — then s06's encode
    // is one broadcast of these trained tables. PqCodebookSpec pins
    // the L2 objective's round-over-round descent, mass conservation
    // per (round, sub), non-vacuous reassignment on the fixture, and
    // that the subspaces genuinely train APART on a corpus clustered
    // differently per subspace.
    Q("s27_pq_codebook_train",
      "per-subspace iterated L2 Lloyd (PQ codebook build, 4×16-dim, k=4, 3 rounds): per-(round, sub, codeword) size + arrivals from exact-decimal centroid statistics",
      (s, d) => pqCodebookRounds(vectors(s, d).select("vec_id", "v"),
        m = 4, subDim = 16, k = 4, rounds = 3)._1,
      Some(s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
             |sv AS (SELECT vec_id, t.sub, v[t.sub * 16 + 1 : t.sub * 16 + 16] AS sv
             |  FROM e CROSS JOIN range(0, 4) t(sub)),
             |c0 AS (SELECT sub, rk - 1 AS clabel, sv AS cent FROM (
             |    SELECT sub, sv,
             |      row_number() OVER (PARTITION BY sub ORDER BY vec_id) AS rk
             |    FROM sv) WHERE rk <= 4)${sqlPqRounds(3)},
             |rep AS (SELECT * FROM r1 UNION ALL SELECT * FROM r2
             |  UNION ALL SELECT * FROM r3)
             |SELECT round, sub, clabel, n, moved_in FROM rep
             |ORDER BY round, sub, clabel""".stripMargin),
      // driver-side loop: constructing the plan runs the per-round collects
      staticSchema = Some(org.apache.spark.sql.types.StructType.fromDDL(
        "round BIGINT, sub BIGINT, clabel BIGINT, n BIGINT, moved_in BIGINT"))),

    // DOES TRAINING IMPROVE SEARCH — the audit that closes the PQ
    // lifecycle: s27 trains codebooks, s06/s07 search against fixed
    // ones; this row ENCODES the corpus under the codebook of each
    // s27 training round and measures ADC top-5 recall against the
    // exact cosine top-5 — the recall-vs-training-rounds curve a
    // quantizer build signs off on before shipping an index (the s14 /
    // s21 curve discipline applied to the training axis). Trains on
    // the NORMALIZED corpus (quantizing direction, the cosine-search
    // regime; s27 grades the raw-corpus trainer — same loop, one
    // shared pqTrain). ADC distance decomposes per subspace
    // (Σ_sub |q_sub|² − 2·q_sub·c + |c|²) and the M terms fold in
    // FIXED subspace order — a plain SUM would reassociate by shuffle
    // order and flip last-ulp ties at the rank-5 boundary, the exact
    // failure class the s26 decimal discipline exists for. Scale
    // shape: codes ⋈ codebook and queries enter BROADCAST; the corpus
    // never reshuffles; the one wide exchange is the per-(query, vec)
    // term fold — |q|·n·M rows, output-bound like s06's ADC scan.
    // PqCodebookSpec pins that round-3 recall dominates round-1 on a
    // planted per-subspace-clustered corpus (training genuinely helps)
    // and that the grid is complete on the real fixture.
    Q("s28_pq_train_recall",
      "ADC top-5 recall vs exact, per s27 training round: the recall-vs-rounds curve — encode under each round's codebook, fixed-order term fold, one shared trainer",
      (s, d) => pqTrainRecall(vectors(s, d),
        m = 4, subDim = 16, k = 16, rounds = 3),
      Some(s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
             |n AS (SELECT vec_id, v,
             |  sqrt(list_reduce(list_transform(range(1, 65), i -> v[i] * v[i]), (x, y) -> x + y)) AS nrm
             |FROM e),
             |nv AS (SELECT vec_id, list_transform(v, x -> x / nrm) AS v FROM n),
             |sv AS (SELECT vec_id, t.sub, v[t.sub * 16 + 1 : t.sub * 16 + 16] AS sv
             |  FROM nv CROSS JOIN range(0, 4) t(sub)),
             |c0 AS (SELECT sub, rk - 1 AS clabel, sv AS cent FROM (
             |    SELECT sub, sv,
             |      row_number() OVER (PARTITION BY sub ORDER BY vec_id) AS rk
             |    FROM sv) WHERE rk <= 16)${sqlPqRounds(4)},
             |cb AS (SELECT 1 AS round, sub, clabel, cent FROM c1
             |  UNION ALL SELECT 2, sub, clabel, cent FROM c2
             |  UNION ALL SELECT 3, sub, clabel, cent FROM c3),
             |code AS (SELECT 1 AS round, vec_id, sub, clabel FROM a2
             |  UNION ALL SELECT 2, vec_id, sub, clabel FROM a3
             |  UNION ALL SELECT 3, vec_id, sub, clabel FROM a4),
             |h AS (SELECT round, sub, clabel, cent,
             |    list_reduce(list_transform(range(1, 17), j -> cent[j] * cent[j]),
             |      (x, y) -> x + y) AS cnrm2
             |  FROM cb),
             |qs AS (SELECT vec_id AS query_id, sub, sv AS qsv,
             |    list_reduce(list_transform(range(1, 17), j -> sv[j] * sv[j]),
             |      (x, y) -> x + y) AS qs2
             |  FROM sv WHERE vec_id % 50 = 0 AND vec_id < 2000),
             |tm AS (SELECT code.round, qs.query_id, code.vec_id, code.sub,
             |    qs.qs2 - 2.0 * list_reduce(list_transform(range(1, 17),
             |      j -> qs.qsv[j] * h.cent[j]), (x, y) -> x + y) + h.cnrm2 AS term
             |  FROM code
             |  JOIN h ON code.round = h.round AND code.sub = h.sub
             |    AND code.clabel = h.clabel
             |  JOIN qs ON qs.sub = code.sub
             |  WHERE code.vec_id <> qs.query_id),
             |dd AS (SELECT round, query_id, vec_id,
             |    sum(CASE WHEN sub = 0 THEN term END)
             |      + sum(CASE WHEN sub = 1 THEN term END)
             |      + sum(CASE WHEN sub = 2 THEN term END)
             |      + sum(CASE WHEN sub = 3 THEN term END) AS dist2
             |  FROM tm GROUP BY round, query_id, vec_id),
             |adc AS (SELECT round, query_id, vec_id FROM (
             |    SELECT round, query_id, vec_id,
             |      row_number() OVER (PARTITION BY round, query_id
             |        ORDER BY dist2, vec_id) AS rk
             |    FROM dd) WHERE rk <= 5),
             |qfull AS (SELECT vec_id AS query_id, v AS qv FROM nv
             |  WHERE vec_id % 50 = 0 AND vec_id < 2000),
             |tr AS (SELECT query_id, vec_id FROM (SELECT q.query_id, nv.vec_id,
             |    row_number() OVER (PARTITION BY q.query_id ORDER BY
             |      list_reduce(list_transform(range(1, 65),
             |        i -> nv.v[i] * q.qv[i]), (x, y) -> x + y) DESC,
             |      nv.vec_id) AS rk
             |  FROM nv CROSS JOIN qfull q WHERE nv.vec_id <> q.query_id)
             |  WHERE rk <= 5),
             |hits AS (SELECT a.round, a.query_id, count(*)::BIGINT AS n
             |  FROM adc a JOIN tr USING (query_id, vec_id) GROUP BY 1, 2),
             |grid AS (SELECT query_id, r.round
             |  FROM (SELECT DISTINCT query_id FROM qs) CROSS JOIN range(1, 4) r(round))
             |SELECT g.query_id, g.round,
             |  coalesce(h2.n, 0)::BIGINT AS n_hits,
             |  coalesce(h2.n, 0) / 5.0 AS recall
             |FROM grid g LEFT JOIN hits h2
             |  ON g.query_id = h2.query_id AND g.round = h2.round
             |ORDER BY g.query_id, g.round""".stripMargin),
      // driver-side: the trainer's per-round collects run at plan time
      staticSchema = Some(org.apache.spark.sql.types.StructType.fromDDL(
        "query_id BIGINT, round BIGINT, n_hits BIGINT, recall DOUBLE"))),

    // DELETION PROPAGATION through the vector index — t44's
    // counterpart on the s09/s10 centroid store, and the reason the
    // store keeps DECIMAL per-dimension SUMS instead of means: sums
    // form a GROUP (subtraction is exact), so erasing vectors is one
    // fold over the tombstoned batch DECREMENTED from the store —
    // corpus never re-read, store rewritten at k×dim size — and the
    // result is BIT-EQUAL to rebuilding the statistics from the
    // surviving members (decimal subtraction never rounds; the cast to
    // double happens once, after the fold, in both engines). A
    // mean-grain store cannot honor erasure this way, and min()-grain
    // stores (the dedup sidecar's canonical) cannot at all without
    // member lists — the store-design lesson ForgetSpec pins from both
    // sides. Forget set: stored members (vec_id ≢ 4 mod 5) with
    // vec_id ≡ 2 mod 7 — every deletion shifts its cluster's sums and
    // count, so the gate is non-vacuous at any SF. A cluster whose
    // members are ALL erased drops from the store (classic Lloyd;
    // spec-planted). Output is s10's gate shape (per-(cluster, dim)
    // folded sum / count / mean) so the two directions of maintenance
    // grade on the same surface.
    Q("s29_forget_centroids",
      "right-to-be-forgotten on the centroid store: tombstoned vectors' exact-decimal sums DECREMENTED — bit-equal to a rebuild over the surviving members",
      (s, d) => {
        graft.plans.VectorExpressions.register(s)
        import org.apache.spark.sql.functions.posexplode
        val store = s.read.parquet(centroidStore(s, d))
        val gone = Tables.embeddings(s, d)
          .filter(col("vec_id") % 5 =!= 4 && col("vec_id") % 7 === 2)
          .select(col("label").cast("long").as("clabel"),
            vecD(col("embedding")).as("v"))
        val folded = decrementStats(store, gone)
        folded.select(col("clabel"), col("cnt").as("upd_cnt"),
            posexplode(array((1 to Dim).map(i => col(s"s_$i")): _*))
              .as(Seq("pos", "f")))
          .select(col("clabel"), (col("pos") + 1).as("dim"),
            col("f").cast("double").as("upd_sum"), col("upd_cnt"),
            (col("f").cast("double") / col("upd_cnt")).as("upd_mean"))
          .orderBy("clabel", "dim")
      },
      Some(s"""WITH e AS (SELECT vec_id, label::BIGINT AS clabel,
             |    list_transform(embedding, x -> x::DOUBLE) AS v
             |  FROM embeddings),
             |idx AS (SELECT unnest(range(1, ${Dim + 1})) AS dim)
             |SELECT clabel, dim,
             |  CAST(sum(CAST(v[dim] AS VARCHAR)::DECIMAL(18,9))::DECIMAL(30,9) AS DOUBLE) AS upd_sum,
             |  count(*)::BIGINT AS upd_cnt,
             |  CAST(sum(CAST(v[dim] AS VARCHAR)::DECIMAL(18,9))::DECIMAL(30,9) AS DOUBLE) / count(*) AS upd_mean
             |FROM e CROSS JOIN idx
             |WHERE vec_id % 5 <> 4 AND vec_id % 7 <> 2
             |GROUP BY clabel, dim
             |ORDER BY clabel, dim""".stripMargin)),

    // GRAPH-ANN QUERY LEG — the half the graph family was missing:
    // s18/s25 BUILD the k-NN-descent graph (HNSW's construction step);
    // this runs the SEARCH that makes it an index (the FAISS/HNSW query
    // path): best-first beam search (beam 8, 5 hops) from one fixed
    // entry point over the undirected one-round graph, per-query
    // recall@5 audited against the exact scan, with n_visited exposing
    // the sublinearity — O(hops·beam·2K) scored nodes per query vs
    // s01's full-corpus scan. Both engines execute the IDENTICAL
    // deterministic algorithm (same graph, same entry, same tie-breaks),
    // so the hash gate pins every hop, not just the final recall.
    Q("s30_graph_beam_search",
      "beam search over the k-NN-descent graph from a fixed entry: per-query visited count, hits and recall@5 vs exact — the query leg of the s18/s25 index",
      (s, d) => knnBeamSearchAudit(vectors(s, d)),
      Some(s"""$sqlVectors,
             |$sqlBucket4,
             |$sqlDescentAdj,
             |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n WHERE vec_id % 50 = 0 AND vec_id < 2000),
             |entry AS (SELECT min(vec_id) AS eid FROM n),
             |v0 AS MATERIALIZED (SELECT q.query_id, n.vec_id,
             |    list_reduce(list_transform(range(1, 65), i -> n.v[i] * q.qv[i]), (x, y) -> x + y)
             |      / (n.nrm * q.qn) AS cosine
             |  FROM q CROSS JOIN entry JOIN n ON n.vec_id = entry.eid),
             |${sqlBeamHops("adj2", "", hops = 5, beam = 8)},
             |${sqlBeamTail("v5")}""".stripMargin)),

    // HIERARCHICAL (two-layer) graph search -- s30 with an HNSW-style
    // upper layer: at 100x corpus scale a SINGLE fixed entry pays more
    // and more hops just to travel from the entry to the query's
    // region, so n_visited grows with corpus diameter. The fix is
    // HNSW's: a SPARSE upper layer (vec_id % 8 = 0, ~1/8 of nodes,
    // its own LSH-seeded 5-NN graph) is searched first with a narrow
    // beam (2, 3 hops) -- long-range moves over a small graph -- and
    // its ENTIRE visited set (every node it scored, honestly counted)
    // seeds the lower-layer walk, which then needs only 3 hops of beam
    // 7 on s30's OWN graph (the shared $sqlDescentAdj chain, so the
    // two gates provably search the same index) instead of s30's 5x8.
    // Both engines run the identical deterministic two-phase walk, so
    // the hash pins every hop of both layers; the measured claim --
    // fewer visited at no recall loss on the same graph, per query --
    // is PipelineOpsSpec's s30-vs-s31 comparison and the committed
    // decade pair.
    Q("s31_graph_two_layer",
      "two-layer beam search: sparse upper layer (narrow beam) finds the entry region, lower layer finishes on s30's graph -- per-query visited count and recall@5 vs exact",
      (s, d) => knnTwoLayerSearchAudit(vectors(s, d)),
      Some(s"""$sqlVectors,
             |$sqlBucket4,
             |$sqlDescentAdj,
             |nu AS (SELECT * FROM n WHERE vec_id % 8 = 0),
             |${sqlBucket4Of("nu", "b4u")},
             |${sqlLshTopK("b4u", "p0u", "g0u")},
             |adju AS MATERIALIZED (SELECT src, dst FROM g0u UNION SELECT dst, src FROM g0u),
             |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n WHERE vec_id % 50 = 0 AND vec_id < 2000),
             |entryu AS (SELECT min(vec_id) AS eid FROM nu),
             |uv0 AS MATERIALIZED (SELECT q.query_id, n.vec_id,
             |    list_reduce(list_transform(range(1, 65), i -> n.v[i] * q.qv[i]), (x, y) -> x + y)
             |      / (n.nrm * q.qn) AS cosine
             |  FROM q CROSS JOIN entryu JOIN n ON n.vec_id = entryu.eid),
             |${sqlBeamHops("adju", "u", hops = 3, beam = 2)},
             |lv0 AS MATERIALIZED (SELECT * FROM uv3),
             |${sqlBeamHops("adj2", "l", hops = 3, beam = 7)},
             |${sqlBeamTail("lv3")}""".stripMargin))
  )

  /** s26's engine over any (vec_id, v, nrm) frame — public so
    * KmeansLloydSpec can drive it on crafted vectors and read the
    * objective curve. Returns (report, per-round assignment-time
    * objectives Σ max-cosine — spec-only, never hash-gated: a
    * corpus-order double sum).
    *
    * Round r: score every vector against the ≤k LITERAL centroids
    * (collected rows from round r-1's agg — k×dim driver state), argmax
    * with first-occurrence tiebreak (= lowest cluster id, matching the
    * oracle's `ORDER BY ccos DESC, clabel`), then ONE agg produces the
    * report row and the next round's exact decimal sufficient
    * statistics ([[statSumCols]] / [[withCentroid]] — the s10 store
    * discipline, so cross-engine centroid bit-equality survives
    * iteration). Empty clusters simply drop out of the agg (classic
    * Lloyd); the label literal array keeps index→cluster-id honest when
    * ids go non-contiguous.
    */
  private[graft] def lloydRounds(vecs: DataFrame, k: Int, rounds: Int)
      : (DataFrame, Seq[Double]) = {
    val s = vecs.sparkSession
    import s.implicits._
    val v = vecs.select("vec_id", "v", "nrm").localCheckpoint(true)
    val seeds = v.orderBy("vec_id").limit(k).select("v", "nrm").collect()
    // (cluster id, centroid, norm) — ≤ k×dim doubles of driver state
    var cents: Seq[(Long, Seq[Double], Double)] = seeds.toSeq.zipWithIndex
      .map { case (r, i) => (i.toLong, r.getSeq[Double](0), r.getDouble(1)) }
    var prev: Option[Seq[(Long, Seq[Double], Double)]] = None
    val report = Seq.newBuilder[(Long, Long, Long, Option[Long])]
    val objectives = Seq.newBuilder[Double]
    // an EMPTY corpus seeds no centroids — zero rounds, empty report
    // (array() of zero score columns would not even analyze)
    (1 to (if (cents.isEmpty) 0 else rounds)).foreach { r =>
      def scoresOf(cs: Seq[(Long, Seq[Double], Double)]): Column =
        array(cs.map { case (_, c, cn) =>
          dotFast(col("v"), typedlit(c)) / (col("nrm") * lit(cn)) }: _*)
      def labelOf(cs: Seq[(Long, Seq[Double], Double)], sc: Column): Column =
        element_at(typedlit(cs.map(_._1)),
          array_position(sc, array_max(sc)).cast("int"))
      val assigned = v
        .withColumn("sc", scoresOf(cents))
        .withColumn("clabel", labelOf(cents, col("sc")))
        .withColumn("best", array_max(col("sc")))
        .withColumn("prev_label",
          prev.map(p => labelOf(p, scoresOf(p)))
            .getOrElse(lit(null).cast("long")))
      val aggCols: Seq[Column] = Seq(
        count(lit(1)).as("n"),
        sum(when(col("prev_label") =!= col("clabel"), 1L).otherwise(0L))
          .as("moved_in"),
        sum(col("best")).as("obj")) ++
        (statSumCols("s") :+ count(lit(1)).as("cnt"))
      val rows = withCentroid(
          assigned.groupBy("clabel").agg(aggCols.head, aggCols.tail: _*))
        .select(col("clabel"), col("n"), col("moved_in"), col("obj"),
          col("cent"), col("cnrm"))
        .collect().sortBy(_.getLong(0)) // ≤ k rows — bounded driver state
      rows.foreach { row =>
        report += ((r.toLong, row.getLong(0), row.getLong(1),
          if (r == 1) None else Some(row.getLong(2))))
      }
      objectives += rows.map(_.getDouble(3)).sum
      prev = Some(cents)
      cents = rows.toSeq.map(rw =>
        (rw.getLong(0), rw.getSeq[Double](4), rw.getDouble(5)))
    }
    val df = report.result()
      .toDF("round", "clabel", "n", "moved_in")
      .orderBy("round", "clabel")
    (df, objectives.result())
  }

  /** Unrolled per-round CTE stages of the s26 oracle, the SQL twin of
    * one [[lloydRounds]] pass: c{i-1} → sc{i} (cosines) → a{i} (argmax
    * assignment, row_number tiebreak) → r{i} (report row: size +
    * arrivals vs a{i-1}) → c{i} (next centroids via [[sqlStatsMeanList]]
    * — the (18,9) exact-decimal mean, bit-equal to the Spark side).
    */
  private def sqlLloydRounds(rounds: Int): String =
    (1 to rounds).map { i =>
      val prevJoin = if (i > 1) s"JOIN a${i - 1} p USING (vec_id)" else ""
      val moved =
        if (i == 1) "NULL::BIGINT"
        else "sum(CASE WHEN p.clabel <> a.clabel THEN 1 ELSE 0 END)::BIGINT"
      val cent =
        if (i < rounds) s""",
           |cs$i AS (SELECT a.clabel, ${sqlStatsMeanList("n.v", Dim)} AS cent
           |  FROM a$i a JOIN n ON a.vec_id = n.vec_id GROUP BY a.clabel),
           |c$i AS (SELECT clabel, cent,
           |    sqrt(list_reduce(list_transform(range(1, ${Dim + 1}),
           |      j -> cent[j] * cent[j]), (x, y) -> x + y)) AS cnrm
           |  FROM cs$i)""".stripMargin
        else ""
      s""",
         |sc$i AS (SELECT n.vec_id, c.clabel,
         |    list_reduce(list_transform(range(1, ${Dim + 1}),
         |      j -> n.v[j] * c.cent[j]), (x, y) -> x + y)
         |      / (n.nrm * c.cnrm) AS ccos
         |  FROM n CROSS JOIN c${i - 1} c),
         |a$i AS (SELECT vec_id, clabel FROM (SELECT vec_id, clabel,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, clabel)
         |      AS rk
         |  FROM sc$i) WHERE rk = 1),
         |r$i AS (SELECT $i::BIGINT AS round, a.clabel,
         |    count(*)::BIGINT AS n, $moved AS moved_in
         |  FROM a$i a $prevJoin GROUP BY a.clabel)$cent""".stripMargin
    }.mkString

  /** s27's engine over any (vec_id, v) frame — public so PqCodebookSpec
    * can drive it on crafted vectors and read the objective curve.
    * Returns (report, per-round assignment-time objectives
    * Σ max(x·c − ½|c|²) — spec-only, never hash-gated: a corpus-order
    * double sum whose NON-DECREASE is equivalent to L2 SSE descent,
    * since |x−c|² = |x|² − 2(x·c − ½|c|²) and Σ|x|² is constant).
    *
    * Round r, ONE corpus pass for all M subspaces: the exploded
    * (vec_id, sub, sv) frame is scored by a per-sub chain of literal
    * centroid arrays (M×k dot products against constants, ½|c|²
    * driver-folded in index order — the oracle's list_reduce twin),
    * argmax with first-occurrence tiebreak = lowest codeword, then one
    * agg per (sub, clabel) yields the report row and the next round's
    * exact-decimal sufficient statistics. Empty codewords drop out
    * (classic Lloyd); per-sub label literals keep index→codeword
    * honest when they do.
    */
  private[graft] def pqCodebookRounds(vecs: DataFrame, m: Int, subDim: Int,
      k: Int, rounds: Int): (DataFrame, Seq[Double]) = {
    val t = pqTrain(vecs, m, subDim, k, rounds)
    (t.report, t.objectives)
  }

  /** One subspace's codebook entries: (codeword id, centroid, ½|c|²). */
  private type PqBook = Seq[(Long, Seq[Double], Double)]

  /** Trained PQ state: the checkpointed exploded (vec_id, sub, sv)
    * frame, the report/objective curves, and the codebooks AFTER each
    * round (cents(r-1) = round r's update) — what s28 encodes and
    * searches against.
    */
  private[graft] final case class PqTrained(sv: DataFrame, report: DataFrame,
      objectives: Seq[Double], cents: Seq[Map[Int, PqBook]])

  /** Per-subspace dispatch over one codebook-scan leaf: the row's OWN
    * sub selects its codebook. One definition for every scan variant so
    * the dispatch shape cannot desynchronize between them.
    */
  private def pqChain(m: Int, cs: Map[Int, PqBook])
      (leaf: PqBook => Column): Column =
    (1 until m).foldLeft(when(col("sub") === 0, leaf(cs(0)))) { (acc, j) =>
      acc.when(col("sub") === j, leaf(cs(j)))
    }

  /** Codeword of the per-subspace L2 argmax (x·c − ½|c|², argmax ⇔
    * argmin |x−c|²; first-occurrence tiebreak = lowest codeword id,
    * the oracle's row_number ORDER BY score DESC, clabel), chained per
    * sub. One compact codegen'd scan per branch (PqArgLabelD) — the
    * spelled-out k-dot array form fell out of whole-stage codegen at
    * k = 16 (janino 64 KB; see PqCodebookScan).
    */
  private def pqLabelOf(m: Int, cs: Map[Int, PqBook]): Column =
    pqChain(m, cs)(b =>
      pqLabelFast(col("sv"), b.map(_._2), b.map(_._1), b.map(_._3)))

  /** Label AND objective term from ONE scan (struct(clabel, best)) —
    * the trainer reads both per row, and separate label/best
    * expressions would scan the identical codebook twice; CSE
    * evaluates the struct node once however many fields are read.
    */
  private def pqArgMaxOf(m: Int, cs: Map[Int, PqBook]): Column =
    pqChain(m, cs)(b =>
      pqArgMaxFast(col("sv"), b.map(_._2), b.map(_._1), b.map(_._3)))

  private[graft] def pqTrain(vecs: DataFrame, m: Int, subDim: Int,
      k: Int, rounds: Int): PqTrained = {
    val s = vecs.sparkSession
    import s.implicits._
    val sv = vecs.select(col("vec_id"),
        posexplode(array((0 until m).map(j =>
          slice(col("v"), j * subDim + 1, subDim)): _*)).as(Seq("sub", "sv")))
      .localCheckpoint(true)
    // Forgy seeds: the k lowest vec_ids' subvectors, every subspace —
    // k·m rows of driver state, read verbatim by both engines
    val seedRows = sv.orderBy("vec_id", "sub").limit(k * m).collect()
    val seedIds = seedRows.map(_.getLong(0)).distinct.sorted
    def halfNrm2(c: Seq[Double]): Double = 0.5 * c.map(x => x * x).sum
    var cents: Map[Int, PqBook] =
      (0 until m).map { j =>
        j -> seedIds.zipWithIndex.map { case (id, ci) =>
          val c = seedRows.find(r => r.getLong(0) == id && r.getInt(1) == j)
            .get.getSeq[Double](2)
          (ci.toLong, c, halfNrm2(c))
        }.toSeq
      }.toMap
    var prev: Option[Map[Int, PqBook]] = None
    val report = Seq.newBuilder[(Long, Long, Long, Long, Option[Long])]
    val objectives = Seq.newBuilder[Double]
    val perRound = Seq.newBuilder[Map[Int, PqBook]]
    (1 to (if (seedIds.isEmpty) 0 else rounds)).foreach { r =>
      val assigned = sv
        .withColumn("am", pqArgMaxOf(m, cents))
        .withColumn("clabel", col("am").getField("clabel"))
        .withColumn("best", col("am").getField("best"))
        .withColumn("prev_label",
          prev.map(p => pqLabelOf(m, p))
            .getOrElse(lit(null).cast("long")))
      val statCols: Seq[Column] = (1 to subDim).map(i =>
        sum(element_at(col("sv"), i).cast(DecimalType(18, 9)))
          .cast(DecimalType(30, 9)).as(s"s_$i"))
      val aggCols: Seq[Column] = Seq(
        count(lit(1)).as("n"),
        sum(when(col("prev_label") =!= col("clabel"), 1L).otherwise(0L))
          .as("moved_in"),
        sum(col("best")).as("obj")) ++
        (statCols :+ count(lit(1)).as("cnt"))
      val rows = assigned.groupBy("sub", "clabel")
        .agg(aggCols.head, aggCols.tail: _*)
        .withColumn("cent", array((1 to subDim).map(i =>
          col(s"s_$i").cast("double") / col("cnt")): _*))
        .select(col("sub"), col("clabel"), col("n"), col("moved_in"),
          col("obj"), col("cent"))
        .collect().sortBy(rw => (rw.getInt(0), rw.getLong(1))) // ≤ m·k rows
      rows.foreach { row =>
        report += ((r.toLong, row.getInt(0).toLong, row.getLong(1),
          row.getLong(2), if (r == 1) None else Some(row.getLong(3))))
      }
      objectives += rows.map(_.getDouble(4)).sum
      prev = Some(cents)
      cents = rows.groupBy(_.getInt(0)).map { case (sub, rws) =>
        sub -> rws.toSeq.map { rw =>
          val c = rw.getSeq[Double](5)
          (rw.getLong(1), c, halfNrm2(c))
        }
      }.toMap
      perRound += cents
    }
    val df = report.result()
      .toDF("round", "sub", "clabel", "n", "moved_in")
      .orderBy("round", "sub", "clabel")
    PqTrained(sv, df, objectives.result(), perRound.result())
  }

  /** s28's engine: train M×k PQ codebooks on the NORMALIZED corpus
    * ([[pqTrain]], the s27 loop verbatim), then for each round's
    * codebook encode the corpus and run ADC top-5 for the fixed query
    * set, counting hits against the exact cosine top-5 — the
    * recall-vs-training-rounds curve a quantizer build signs off on.
    *
    * Exactness discipline: ADC distance to an encoded vector is
    * Σ_sub (|q_sub|² − 2·q_sub·c + |c|²). The per-sub terms are
    * computed once each (dotFast + driver/list_reduce folds, the
    * established bit-equal kernels) and summed in FIXED subspace order
    * (t0+t1+t2+t3, left-associated in both engines) — a plain SUM over
    * the M rows would reassociate by shuffle order and flip last-ulp
    * ties at the rank-5 boundary. Codes join their codebook as a
    * BROADCAST dim (M·k rows); the query set joins broadcast (s01's
    * discipline); the corpus never reshuffles for probes — the one
    * wide exchange is the per-(query, vec) term fold.
    */
  private[graft] def pqTrainRecall(vecs: DataFrame, m: Int, subDim: Int,
      k: Int, rounds: Int): DataFrame = {
    val s = vecs.sparkSession
    import s.implicits._
    val vn = vecs.select(col("vec_id"),
        transform(col("v"), x => x / col("nrm")).as("v"))
      .localCheckpoint(true)
    val t = pqTrain(vn, m, subDim, k, rounds)
    val qv = vn.filter(col("vec_id") % 50 === 0 && col("vec_id") < 2000)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val qsub = qv.select(col("query_id"),
        posexplode(array((0 until m).map(j =>
          slice(col("qv"), j * subDim + 1, subDim)): _*)).as(Seq("sub", "qsv")))
      .withColumn("qs2", dotFast(col("qsv"), col("qsv")))
    val wAdc = Window.partitionBy(col("round"), col("query_id"))
      .orderBy(col("dist2").asc, col("vec_id").asc)
    // an EMPTY corpus trains no codebooks — zero rounds, empty curve
    // (reduce over zero round legs would throw, the seed-from-sample
    // crash class the degenerate-input sweep polices)
    val legs = t.cents.zipWithIndex.map { case (cb, i) =>
      val cbDf = cb.toSeq.flatMap { case (sub, book) =>
        book.map { case (cl, c, hn) => (sub, cl, c, 2.0 * hn) }
      }.toDF("sub", "clabel", "cent", "cnrm2")
      t.sv
        .withColumn("clabel", pqLabelOf(m, cb))
        .join(broadcast(cbDf), Seq("sub", "clabel"))
        .join(broadcast(qsub), Seq("sub"))
        .filter(col("vec_id") =!= col("query_id"))
        .withColumn("term",
          col("qs2") - lit(2.0) * dotFast(col("qsv"), col("cent")) +
            col("cnrm2"))
        .groupBy(col("query_id"), col("vec_id"))
        .agg(sum(when(col("sub") === 0, col("term"))).as("t0"),
          (1 until m).map(j =>
            sum(when(col("sub") === j, col("term"))).as(s"t$j")): _*)
        .withColumn("dist2", (1 until m).foldLeft[Column](col("t0")) {
          (acc, j) => acc + col(s"t$j") })
        .withColumn("round", lit((i + 1).toLong))
        .withColumn("adc_rank", row_number().over(wAdc))
        .filter(col("adc_rank") <= 5)
        .select(col("round"), col("query_id"), col("vec_id"))
    }
    val approx = legs
      .reduceOption(_ unionAll _)
      .getOrElse(Seq.empty[(Long, Long, Long)]
        .toDF("round", "query_id", "vec_id"))
    val wT = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    val truth = vn.crossJoin(broadcast(qv))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", dotFast(col("v"), col("qv")))
      .withColumn("rank", row_number().over(wT))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("vec_id"))
    val hits = approx.join(truth, Seq("query_id", "vec_id"))
      .groupBy(col("round"), col("query_id"))
      .agg(count(lit(1)).as("hits"))
    val grid = qv.select(col("query_id"))
      .crossJoin((1 to rounds).map(_.toLong).toDF("round"))
    grid.join(hits, Seq("round", "query_id"), "left")
      .select(col("query_id"), col("round"),
        coalesce(col("hits"), lit(0L)).as("n_hits"))
      .withColumn("recall", col("n_hits") / lit(5.0))
      .orderBy("query_id", "round")
  }

  /** Unrolled per-round CTE stages of the s27 oracle, the SQL twin of
    * one [[pqCodebookRounds]] pass at subDim = 16, k = 4: c{i-1} →
    * h{i-1} (½|c|², the same index-ordered fold the driver runs) →
    * sc{i} (L2 scores x·c − ½|c|²) → a{i} (argmax per (vec, sub),
    * row_number tiebreak) → r{i} (report row) → c{i} (next codebooks
    * via [[sqlStatsMeanList]] — the (18,9) exact-decimal mean,
    * bit-equal to the Spark side).
    */
  private def sqlPqRounds(rounds: Int): String =
    (1 to rounds).map { i =>
      val prevJoin =
        if (i > 1) s"JOIN a${i - 1} p ON a.vec_id = p.vec_id AND a.sub = p.sub"
        else ""
      val moved =
        if (i == 1) "NULL::BIGINT"
        else "sum(CASE WHEN p.clabel <> a.clabel THEN 1 ELSE 0 END)::BIGINT"
      val cent =
        if (i < rounds) s""",
           |c$i AS (SELECT a.sub, a.clabel, ${sqlStatsMeanList("s.sv", 16)} AS cent
           |  FROM a$i a JOIN sv s ON a.vec_id = s.vec_id AND a.sub = s.sub
           |  GROUP BY a.sub, a.clabel)""".stripMargin
        else ""
      s""",
         |h${i - 1} AS (SELECT sub, clabel, cent,
         |    0.5 * list_reduce(list_transform(range(1, 17),
         |      j -> cent[j] * cent[j]), (x, y) -> x + y) AS hn
         |  FROM c${i - 1}),
         |sc$i AS (SELECT s.vec_id, s.sub, c.clabel,
         |    list_reduce(list_transform(range(1, 17),
         |      j -> s.sv[j] * c.cent[j]), (x, y) -> x + y) - c.hn AS score
         |  FROM sv s JOIN h${i - 1} c ON s.sub = c.sub),
         |a$i AS (SELECT vec_id, sub, clabel FROM (SELECT vec_id, sub, clabel,
         |    row_number() OVER (PARTITION BY vec_id, sub
         |      ORDER BY score DESC, clabel) AS rk
         |  FROM sc$i) WHERE rk = 1),
         |r$i AS (SELECT $i::BIGINT AS round, a.sub, a.clabel,
         |    count(*)::BIGINT AS n, $moved AS moved_in
         |  FROM a$i a $prevJoin GROUP BY a.sub, a.clabel)$cent""".stripMargin
    }.mkString

  /** Unrolled per-round CTE stages of the s25 oracle: g{i} → rv/adj/non/
    * sc/u → g{i+1}, the SQL twin of [[descentRound]] (s18's one-round
    * fragment, parameterized by round index).
    */
  private def sqlDescentRounds(rounds: Int): String =
    (0 until rounds).map { i =>
      s""",
         |rv$i AS (SELECT dst AS src, src AS dst FROM (
         |    SELECT src, dst,
         |      row_number() OVER (PARTITION BY dst ORDER BY cosine DESC, src) AS rrk
         |    FROM g$i) WHERE rrk <= 5),
         |adj$i AS (SELECT src, dst FROM g$i UNION SELECT src, dst FROM rv$i),
         |non$i AS (SELECT DISTINCT a.src AS src, c.dst AS dst
         |  FROM adj$i a JOIN adj$i c ON a.dst = c.src WHERE a.src <> c.dst),
         |sc$i AS (SELECT non$i.src, non$i.dst,
         |    list_reduce(list_transform(range(1, 65), i -> s.v[i] * t.v[i]), (x, y) -> x + y)
         |      / (s.nrm * t.nrm) AS cosine
         |  FROM non$i JOIN n s ON non$i.src = s.vec_id JOIN n t ON non$i.dst = t.vec_id),
         |u$i AS (SELECT src, dst, max(cosine) AS cosine FROM (
         |    SELECT src, dst, cosine FROM g$i
         |    UNION ALL SELECT src, dst, cosine FROM sc$i) GROUP BY 1, 2),
         |g${i + 1} AS (SELECT src, dst, cosine FROM (
         |    SELECT src, dst, cosine,
         |      row_number() OVER (PARTITION BY src ORDER BY cosine DESC, dst) AS rk
         |    FROM u$i) WHERE rk <= 5)""".stripMargin
    }.mkString

  /** s18's engine over any (vec_id, v, nrm) frame — public so the
    * planted-cluster spec can run it on crafted vectors.
    *
    * Round: seed graph g0 = per-node top-K over the union of both
    * 4-plane tables' bucket-mates; adjacency = forward ∪ top-K reverse
    * edges (reverse cap bounds hub in-degree); candidates =
    * neighbors-of-neighbors, exact-rescored, unioned with g0,
    * re-top-K'd into g1. Audit: per query (vec_id % queryMod = 0),
    * hits of g0 and g1 against the exact cosine top-K.
    *
    * Scale: every join is keyed (bucket / node id) and SHUFFLED — the
    * graph, adjacency and candidate frames are all O(n·K²) and
    * output-bound; nothing corpus-scale broadcasts (the query set
    * alone does, s01's discipline). The bucket self-joins' Σ|b|² cost
    * is the documented plane-count trade, and ONE round is the d09
    * bounded-loop discipline: production iterates rounds-to-convergence
    * with this exact per-round plan. Monotonicity is structural: g1 is
    * the top-K of a superset of g0's edges, so descent recall never
    * drops below seed recall.
    */
  /** THE adaptive-plane two-table LSH seed every graph audit builds on
    * (s18 one-round, s25 rounds-to-convergence, s30 beam search):
    * returns the bucketed corpus `e` and the top-K seed graph `g0`,
    * both eagerly checkpointed. ONE body — the [[descentRound]] /
    * mergeViewDelta extraction discipline — so the three audits can
    * never disagree on the index they build, iterate, or search (a
    * seed-rule change applied to one copy and missed in another would
    * silently price or search a DIFFERENT graph than the one the gates
    * hash).
    *
    * Index-build-time occupancy knob: p planes per table holds bucket
    * size n/2^p at ~16–32 vectors, so the seed self-join's Σ|b|² is
    * n·occupancy — LINEAR in the corpus, not n²/2^p at fixed p (the
    * r11 decade sweep measured the fixed-4-plane build at exponent
    * 1.21/decade). p(n) = max(4, ceil(log2(n/32))), integer-exact
    * (ln-ratio log2 is off by 1 ulp exactly at powers of two, which
    * would bump the gates off their oracles): 4 at the sf0.01 oracle
    * gate (n = 500, matching the SQL twins' planes 0–3 / 4–7), 6 at
    * sf0.1, 10 at sf1. The count() is one metadata-cheap action — the
    * production analogue is the index builder reading the vector
    * store's row count before choosing its hash family.
    */
  private def lshSeedGraph(vecs: DataFrame, K: Int)
      : (DataFrame, DataFrame) = {
    val n = vecs.count()
    var p = 4
    while (n > (32L << p)) p += 1
    val e = vecs
      .withColumn("bucket_a", bucketPCol(col("v"), 0, p))
      .withColumn("bucket_b", bucketPCol(col("v"), p, p))
      .localCheckpoint(true)
    def side(role: String): DataFrame = e.select(
      col("vec_id").as(role),
      col("v").as(s"${role.head}v"), col("nrm").as(s"${role.head}n"),
      col("bucket_a"), col("bucket_b"))
    val src = side("src")
    val dst = side("dst")
    def bucketPairs(bucket: String): DataFrame =
      src.drop(if (bucket == "bucket_a") "bucket_b" else "bucket_a")
        .hint("shuffle_hash").join(
          dst.drop(if (bucket == "bucket_a") "bucket_b" else "bucket_a"),
          Seq(bucket))
        .filter(col("src") =!= col("dst"))
        .withColumn("cosine",
          dotFast(col("sv"), col("dv")) / (col("sn") * col("dn")))
        .select("src", "dst", "cosine")
    val wTop = Window.partitionBy("src")
      .orderBy(col("cosine").desc, col("dst").asc)
    val g0 = bucketPairs("bucket_a").union(bucketPairs("bucket_b"))
      .distinct()
      .withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= K).select("src", "dst", "cosine")
      .localCheckpoint(true)
    (e, g0)
  }

  private[graft] def knnDescentAudit(vecs: DataFrame,
      queryMod: Int = 50, queryCap: Long = 2000L): DataFrame = {
    val K = 5
    val (e, g0) = lshSeedGraph(vecs, K)
    val q = e.filter(col("vec_id") % queryMod === 0 &&
        col("vec_id") < queryCap)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    // the exact-truth leg needs only (e, q): materialize it on a pool
    // thread WHILE the descent round runs (guide §2.6 — the s30/s31
    // overlap discipline; output-identical, both legs are deterministic
    // functions of the checkpointed e)
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(1)
    val (g1, exact) = try {
      implicit val ec: ExecutionContext =
        ExecutionContext.fromExecutorService(pool)
      val exactF = Future(e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("query_id"))
        .withColumn("cosine",
          dotFast(col("v"), col("qv")) / (col("nrm") * col("qn")))
        .withColumn("rank", row_number().over(wq))
        .filter(col("rank") <= K)
        .select(col("query_id"), col("vec_id").as("tru"))
        .localCheckpoint(true))
      (descentRound(e, g0, K), Await.result(exactF, Duration.Inf))
    } finally pool.shutdown()
    def hitsOf(g: DataFrame, as: String): DataFrame = exact
      .join(g.select(col("src").as("query_id"), col("dst").as("tru")),
        Seq("query_id", "tru"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as(as))
    q.select("query_id")
      .join(hitsOf(g0, "n_init"), Seq("query_id"), "left")
      .join(hitsOf(g1, "n_desc"), Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_init"), lit(0L)).as("n_init"),
        coalesce(col("n_desc"), lit(0L)).as("n_desc"),
        (coalesce(col("n_init"), lit(0L)) * lit(1.0) / K)
          .as("recall_init"),
        (coalesce(col("n_desc"), lit(0L)) * lit(1.0) / K)
          .as("recall_desc"))
      .orderBy("query_id")
  }

  /** THE k-NN-descent round (Dong et al., WWW'11), extracted so the
    * single-round audit (s18) and the rounds-to-convergence build (s25)
    * run the IDENTICAL per-round plan: undirect the current graph
    * (top-K reverse edges), compose 2-hop neighbor-of-neighbor
    * candidates through one keyed self-join, score them, and re-top-K
    * against the incumbent edges (max-cosine dedup). Returns g_{i+1},
    * eagerly checkpointed — the d09 per-round lineage discipline, and
    * the reason a bounded loop over this function stays O(rounds) plans
    * deep, not O(rounds²). Everything is keyed-shuffled and O(n·K²)
    * output-bound; nothing corpus-scale broadcasts.
    */
  private def descentRound(e: DataFrame, g: DataFrame, K: Int): DataFrame = {
    val wTop = Window.partitionBy("src")
      .orderBy(col("cosine").desc, col("dst").asc)
    val wr = Window.partitionBy("dst")
      .orderBy(col("cosine").desc, col("src").asc)
    val rev = g.withColumn("rrk", row_number().over(wr))
      .filter(col("rrk") <= K)
      .select(col("dst").as("src"), col("src").as("dst"))
    val adj = g.select("src", "dst").union(rev).distinct()
    val non = adj.select(col("src"), col("dst").as("mid"))
      .hint("shuffle_hash")
      .join(adj.select(col("src").as("mid"), col("dst")), Seq("mid"))
      .filter(col("src") =!= col("dst"))
      .select("src", "dst").distinct()
    val scored = non
      .join(e.select(col("vec_id").as("src"), col("v").as("sv"),
        col("nrm").as("sn")).hint("shuffle_hash"), Seq("src"))
      .join(e.select(col("vec_id").as("dst"), col("v").as("dv"),
        col("nrm").as("dn")).hint("shuffle_hash"), Seq("dst"))
      .withColumn("cosine",
        dotFast(col("sv"), col("dv")) / (col("sn") * col("dn")))
      .select("src", "dst", "cosine")
    g.union(scored)
      .groupBy("src", "dst").agg(max(col("cosine")).as("cosine"))
      .withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= K).select("src", "dst", "cosine")
      .localCheckpoint(true)
  }

  /** MULTI-ROUND k-NN descent (s25) — the production build s18's
    * single-round audit prices: iterate [[descentRound]] a bounded
    * `rounds` times from the same two-table LSH seed and report, PER
    * QUERY AND PER ROUND, the hits against the exact top-K. Monotone by
    * construction at every step — g_{i+1} is the top-K of a SUPERSET of
    * g_i's edges, and a true top-K neighbor can be displaced only by a
    * strictly-higher-cosine candidate, of which fewer than K exist — so
    * per-query hit counts never decrease with the round; the planted-
    * cluster spec additionally pins strict progress ACROSS rounds (a
    * 2-hop-per-round frontier needs round i+1 to reach what round i
    * composed). Early-exit on convergence (new graph ≡ old graph) is
    * the production lever; here rounds are small and fixed so the gate
    * prices the full ladder.
    */
  private[graft] def knnDescentRoundsAudit(vecs: DataFrame, rounds: Int,
      queryMod: Int = 50, queryCap: Long = 2000L): DataFrame = {
    val K = 5
    val (e, g0) = lshSeedGraph(vecs, K)
    val q = e.filter(col("vec_id") % queryMod === 0 &&
        col("vec_id") < queryCap)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    // exact truth needs only (e, q): overlap it with the descent ladder
    // (guide §2.6 — same discipline as s18/s30/s31; output-identical,
    // both legs are deterministic functions of the checkpointed e)
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(1)
    val (graphsOut, exact) = try {
      implicit val ec: ExecutionContext =
        ExecutionContext.fromExecutorService(pool)
      val exactF = Future(e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("query_id"))
        .withColumn("cosine",
          dotFast(col("v"), col("qv")) / (col("nrm") * col("qn")))
        .withColumn("rank", row_number().over(wq))
        .filter(col("rank") <= K)
        .select(col("query_id"), col("vec_id").as("tru"))
        .localCheckpoint(true))
      var g = g0
      val graphs = Seq.newBuilder[(Int, DataFrame)]
      graphs += ((0, g))
      (1 to rounds).foreach { i =>
        val prev = g
        g = descentRound(e, g, K)
        graphs += ((i, g))
        prev.unpersist(blocking = false): Unit
      }
      (graphs.result(), Await.result(exactF, Duration.Inf))
    } finally pool.shutdown()
    graphsOut.map { case (i, gi) =>
      q.select("query_id")
        .join(exact
          .join(gi.select(col("src").as("query_id"), col("dst").as("tru")),
            Seq("query_id", "tru"), "left_semi")
          .groupBy("query_id").agg(count(lit(1)).as("n_hits")),
          Seq("query_id"), "left")
        .select(col("query_id"), lit(i.toLong).as("round"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"))
    }.reduce(_.unionByName(_))
  }

  /** GRAPH-ANN QUERY LEG (s30) — the search half that makes the s18/s25
    * k-NN graph an INDEX (the HNSW/NSG query path): best-first BEAM
    * search from one fixed entry point (the corpus's min vec_id — the
    * deterministic stand-in for HNSW's top-layer entry) over the
    * UNDIRECTED one-descent-round graph, audited per query against the
    * exact top-K (the d20/s12/s13/s16 audit discipline). Per hop: the
    * beam (≤ |queries|·BEAM rows) probes the edge list on its source —
    * a keyed, workload-sized join against a corpus-sized but
    * degree-bounded adjacency (≤ 2·K·n edges); unseen candidates score
    * against the broadcast queries; visited accumulates and the next
    * beam is its per-query top-BEAM (best-first with memory — monotone
    * by construction). The corpus never re-shuffles, nothing
    * corpus-scale broadcasts, and per-query work is O(HOPS·BEAM·2K)
    * scored nodes however large the corpus — the sublinearity the
    * n_visited output column exhibits directly against the s01 exact
    * scan the recall is audited on.
    */
  /** Score candidate (query_id, vec_id) pairs against the corpus
    * vectors — change-sized join onto the vector frame, queries
    * broadcast; the one scoring kernel of the s30/s31 walks.
    */
  private def beamScored(e: DataFrame, q: DataFrame)(
      cand: DataFrame): DataFrame = broadcast(cand)
    // the candidate set is workload-sized (≤ |Q|·beam·2K rows per hop):
    // broadcasting it means the corpus vector frame is SCANNED, never
    // shuffled, by every scoring pass (guide §3.1 — r17: the
    // shuffle_hash form re-exchanged the whole corpus each hop, since
    // localCheckpoint does not carry partitioning across hops)
    .join(e.select(col("vec_id"), col("v"), col("nrm")), Seq("vec_id"))
    .join(broadcast(q), Seq("query_id"))
    .withColumn("cosine",
      dotFast(col("v"), col("qv")) / (col("nrm") * col("qn")))
    .select("query_id", "vec_id", "cosine")

  /** `hops` best-first beam expansions over adjacency `adj`, growing
    * `visited0`: per hop, each query's top-`beam` visited nodes expand
    * (per-hop candidate-join against the adjacency, never a corpus
    * scan), unvisited neighbors score, and the visited set grows.
    * localCheckpoint between hops bounds the plan; ONE body for the
    * s30 walk and both s31 layers — the loop the oracle generator
    * [[sqlBeamHops]] twins.
    */
  private def beamHops(e: DataFrame, q: DataFrame, adj: DataFrame,
      visited0: DataFrame, hops: Int, beam: Int): DataFrame = {
    val wb = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("vec_id").asc)
    var visited = visited0.localCheckpoint(true)
    (1 to hops).foreach { _ =>
      val bm = visited.withColumn("rk", row_number().over(wb))
        .filter(col("rk") <= beam)
        .select("query_id", "vec_id")
      // beam and visited are workload-sized (≤ |Q|·beam resp.
      // |Q|·hops·beam·2K rows — bounded by the walk's construction,
      // independent of corpus size): broadcast both so the
      // degree-bounded but corpus-SCALE adjacency is scanned, never
      // shuffled, on every hop (guide §3.1)
      val cand = broadcast(bm.select(col("query_id"), col("vec_id").as("src")))
        .join(adj, Seq("src"))
        .select(col("query_id"), col("dst").as("vec_id"))
        .distinct()
        .join(broadcast(visited.select("query_id", "vec_id")),
          Seq("query_id", "vec_id"), "left_anti")
      val prev = visited
      visited = visited.unionByName(beamScored(e, q)(cand))
        .localCheckpoint(true)
      prev.unpersist(blocking = false): Unit
    }
    visited
  }

  /** The exact top-K truth of the walk audits — the documented
    * O(|Q|·n) audit leg, shared by s30/s31 and materialized EARLY on a
    * pool thread (guide §2.6): it depends only on (e, q), so it runs
    * concurrently with the beam walk instead of serially after it.
    */
  private def beamExact(e: DataFrame, q: DataFrame, K: Int): DataFrame = {
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine",
        dotFast(col("v"), col("qv")) / (col("nrm") * col("qn")))
      .withColumn("rank", row_number().over(wq))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("vec_id").as("tru"))
  }

  /** The audit tail over a final visited set: top-K answer, hits vs the
    * (pre-materialized) exact truth, visited counts — the s30/s31
    * shared report ([[sqlBeamTail]]'s twin).
    */
  private def beamAuditReport(q: DataFrame,
      visited: DataFrame, K: Int, exact: DataFrame): DataFrame = {
    val wb = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("vec_id").asc)
    val ans = visited.filter(col("vec_id") =!= col("query_id"))
      .withColumn("rk", row_number().over(wb))
      .filter(col("rk") <= K)
      .select("query_id", "vec_id")
    val hits = exact
      .join(ans.select(col("query_id"), col("vec_id").as("tru")),
        Seq("query_id", "tru"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
    val nVisited = visited.groupBy("query_id")
      .agg(count(lit(1)).as("n_visited"))
    q.select("query_id")
      .join(nVisited, Seq("query_id"), "left")
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_visited"), lit(0L)).as("n_visited"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) * lit(1.0) / K)
          .as("recall_beam"))
      .orderBy("query_id")
  }

  /** The undirected degree-≤2K search adjacency of a directed K-NN
    * graph (HNSW searches neighbor lists both ways).
    */
  private def undirectedAdj(g: DataFrame): DataFrame =
    g.select("src", "dst")
      .union(g.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(true)

  private def beamQueries(e: DataFrame, queryMod: Int,
      queryCap: Long): DataFrame =
    e.filter(col("vec_id") % queryMod === 0 &&
        col("vec_id") < queryCap)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"))

  private def emptyBeamAudit(q: DataFrame): DataFrame =
    q.select(col("query_id"), lit(0L).as("n_visited"),
      lit(0L).as("n_hits"), lit(0.0).as("recall_beam"))
      .orderBy("query_id")

  private[graft] def knnBeamSearchAudit(vecs: DataFrame,
      queryMod: Int = 50, queryCap: Long = 2000L): DataFrame = {
    val K = 5
    // identical build to knnDescentAudit — the SHARED lshSeedGraph +
    // one descent round → g1 (the persisted index a production build
    // would ship; rebuilt here so gate and oracle stay in lockstep on
    // one code path)
    val (e, g0) = lshSeedGraph(vecs, K)
    val g1 = descentRound(e, g0, K)
    val adj = undirectedAdj(g1)
    val q = beamQueries(e, queryMod, queryCap)
    // fixed deterministic entry point — one metadata-cheap action (the
    // production analogue reads the index's entry id, not the corpus).
    // An EMPTY corpus has no entry (min is NULL): no queries exist
    // either, so the audit is the empty frame with the gate's schema
    val entryRow = vecs.agg(min(col("vec_id"))).head()
    if (entryRow.isNullAt(0)) return emptyBeamAudit(q)
    // the exact-truth audit leg needs only (e, q): materialize it on a
    // pool thread WHILE the walk runs (guide §2.6) instead of after it
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(1)
    try {
      implicit val ec: ExecutionContext =
        ExecutionContext.fromExecutorService(pool)
      val exactF = Future(beamExact(e, q, K).localCheckpoint(true))
      val visited = beamHops(e, q, adj,
        beamScored(e, q)(q.select(col("query_id"))
          .withColumn("vec_id", lit(entryRow.getLong(0)))),
        hops = 5, beam = 8)
      beamAuditReport(q, visited, K, Await.result(exactF, Duration.Inf))
    } finally pool.shutdown()
  }

  /** The s31 two-layer walk: the sparse upper layer (vec_id % 8 = 0,
    * its own LSH-seeded K-NN graph — HNSW's long-range layer) searches
    * first at beam 2 × 3 hops from the layer's min-id entry; its FULL
    * visited set (every scored node, honestly counted into n_visited)
    * seeds the lower walk over s30's own descent graph at beam 7 × 3
    * hops (vs s30's 8 × 5). The operating point is MEASURED, not
    * asserted (deterministic walk, exact counts): at sf0.1 s31 scores
    * 3859 nodes to s30's 4136 (−6.7%) and hits 31 vs 27 of 200 truth —
    * strictly dominant; at the sf0.01 gate (500 vectors — diameter ~3,
    * too small for a hierarchy to pay) it still visits 13% fewer.
    * PipelineOpsSpec pins the sf0.1 dominance. Degenerate corpora
    * (specs, empty-input sweep): no upper nodes at all falls back to
    * the s30 single-layer walk from the global entry — never unseeded.
    */
  private[graft] def knnTwoLayerSearchAudit(vecs: DataFrame,
      queryMod: Int = 50, queryCap: Long = 2000L,
      upperHops: Int = 3, upperBeam: Int = 2,
      lowerHops: Int = 3, lowerBeam: Int = 7): DataFrame = {
    val K = 5
    // The FULL index build (LSH seed + one descent round + undirect —
    // the expensive eager chain) and the sparse UPPER layer's build and
    // walk are independent until the lower walk starts: overlap them
    // (guide §2.6, independent jobs from a driver pool). The upper walk
    // scores against the upper layer's OWN bucketed frame — its
    // candidates are upper nodes by construction (adjUp edges connect
    // only upper nodes), and v/nrm there are the same values the full
    // frame carries, so every cosine is bit-identical; `q` derives from
    // the raw corpus for the same reason (one extra eager checkpoint,
    // reused by every per-hop broadcast build of both walks).
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(1)
    try {
      implicit val ec: ExecutionContext =
        ExecutionContext.fromExecutorService(pool)
      val lowerF = Future {
        val (e, g0) = lshSeedGraph(vecs, K)
        (e, undirectedAdj(descentRound(e, g0, K)))
      }
      val q = beamQueries(vecs, queryMod, queryCap).localCheckpoint(true)
      val entryRow = vecs.agg(min(col("vec_id"))).head()
      if (entryRow.isNullAt(0)) return emptyBeamAudit(q)
      val upperVecs = vecs.filter(col("vec_id") % 8 === 0)
      val upEntryRow = upperVecs.agg(min(col("vec_id"))).head()
      val seeded =
        if (upEntryRow.isNullAt(0)) {
          // no upper layer at all: the s30 single-layer fallback seeds
          // from the global entry — needs the full frame, so await it
          val (e, _) = Await.result(lowerF, Duration.Inf)
          beamScored(e, q)(q.select(col("query_id"))
            .withColumn("vec_id", lit(entryRow.getLong(0))))
        } else {
          val (eu, g0u) = lshSeedGraph(upperVecs, K)
          val adjUp = undirectedAdj(g0u)
          beamHops(eu, q, adjUp,
            beamScored(eu, q)(q.select(col("query_id"))
              .withColumn("vec_id", lit(upEntryRow.getLong(0)))),
            hops = upperHops, beam = upperBeam)
        }
      val (e, adj) = Await.result(lowerF, Duration.Inf)
      // exact truth overlaps the LOWER walk the same way (it needs only
      // the just-arrived full frame and q)
      val exactF = Future(beamExact(e, q, K).localCheckpoint(true))
      val visited = beamHops(e, q, adj, seeded,
        hops = lowerHops, beam = lowerBeam)
      beamAuditReport(q, visited, K, Await.result(exactF, Duration.Inf))
    } finally pool.shutdown()
  }

  /** One Lloyd maintenance step in WRITE-BACK form: assign each batch
    * vector (vec_id, v) to its nearest stored centroid (s09's argmin,
    * same tie-break), fold the batch's per-dimension exact decimal sums
    * and count into the store's, and return the updated store — SAME
    * schema as [[centroidStats]], ready to overwrite the sidecar for
    * the next day's s09 assignment. Because the statistics are exact
    * decimals, the fold COMPOSES: folding day A then day B is bit-equal
    * to rebuilding the statistics from scratch over stored ∪ A ∪ B with
    * the same assignments — the invariant the multi-day lifecycle spec
    * pins (decimal addition is associative; double summation is not,
    * which is exactly why the store holds sums, not means).
    * Scale shape: the k-row store broadcasts onto the batch for the
    * argmin; the fold joins two k-row frames; stored vectors never
    * enter the plan.
    */
  private[graft] def foldedCentroidStats(stats: DataFrame,
      batch: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("clabel").asc)
    val assigned = batch
      .withColumn("nrm", sqrt(dotFast(col("v"), col("v"))))
      .crossJoin(broadcast(stats.select(col("clabel"), col("cent"), col("cnrm"))))
      .withColumn("ccos",
        dotFast(col("v"), col("cent")) / (col("nrm") * col("cnrm")))
      .withColumn("crank", row_number().over(w))
      .filter(col("crank") === 1)
      .select(col("clabel"), col("v"))
    val bsums = statSumCols("b")
    val bstats = assigned.groupBy(col("clabel"))
      .agg(bsums.head, (bsums.tail :+ count(lit(1)).as("bcnt")): _*)
    withCentroid(stats
      .select((col("clabel") +: (1 to Dim).map(i => col(s"s_$i"))) :+ col("cnt"): _*)
      .join(bstats, Seq("clabel"), "left")
      .select((col("clabel") +: (1 to Dim).map(i =>
        (col(s"s_$i") + coalesce(col(s"b_$i"), lit(0).cast(DecimalType(30, 9))))
          .cast(DecimalType(30, 9)).as(s"s_$i"))) :+
        (col("cnt") + coalesce(col("bcnt"), lit(0L))).as("cnt"): _*))
  }

  /** The persisted centroid-index sidecar the incremental ANN gates
    * share (s09 assigns against it, s10 folds new batches into it):
    * [[centroidStats]] of the stored (vec_id % 5 != 4) slice, built
    * once per JVM at a per-process path (StoreFixture).
    */
  /** The ONE decrement fold of the centroid-store forget path — s29's
    * gate and the streaming [[graft.streaming.VectorStreams.forgetIngest]]
    * producer share it, so continuous erasure can never diverge from the
    * gated one-shot on the statistics arithmetic. `gone` is (clabel, v);
    * the batch's exact-decimal per-dimension sums and counts SUBTRACT
    * from the store's (decimal subtraction never rounds — sums form a
    * group, the property the store's schema was chosen for), and a
    * cluster whose count reaches zero drops out (classic Lloyd). The
    * tombstone batch enters BROADCAST; the store scans once.
    */
  private[graft] def decrementStats(store: DataFrame,
      gone: DataFrame, validate: Boolean = false): DataFrame = {
    val decCols: Seq[Column] = (1 to Dim).map(i =>
      sum(element_at(col("v"), i).cast(DecimalType(18, 9)))
        .cast(DecimalType(30, 9)).as(s"d_$i")) :+
      count(lit(1)).as("dcnt")
    val dec = gone.groupBy("clabel").agg(decCols.head, decCols.tail: _*)
    val folded = store.join(broadcast(dec), Seq("clabel"), "left")
      .select(col("clabel") +: ((1 to Dim).map(i =>
        (col(s"s_$i") - coalesce(col(s"d_$i"),
          lit(0).cast(DecimalType(30, 9))))
          .cast(DecimalType(30, 9)).as(s"s_$i")) :+
        (col("cnt") - coalesce(col("dcnt"), lit(0L))).as("cnt")): _*)
    if (validate) {
      // the silent failure modes of a compliance path, surfaced: a
      // tombstone set exceeding a cluster's folded members would
      // otherwise vanish into the cnt > 0 filter (erasing never-erased
      // members' statistics with it), and a tombstone crediting a
      // cluster the store never folded would no-op while its real
      // cluster stays inflated. Two k-sized driver actions — callers on
      // the plan-pure gate path (s29/c22) keep the default and the
      // documented classic-Lloyd drop semantics.
      val over = folded.filter(col("cnt") < 0).count()
      require(over == 0,
        s"over-erasure: $over clusters driven negative — tombstones exceed folded members")
      val unknown = dec.join(store.select("clabel"), Seq("clabel"),
        "left_anti").count()
      require(unknown == 0,
        s"$unknown tombstone clusters unknown to the store")
    }
    folded.filter(col("cnt") > 0)
  }

  private[graft] def centroidStore(s: SparkSession, d: String): String =
    graft.core.StoreFixture("graft_centstore", d) { p =>
      graft.plans.VectorExpressions.register(s)
      centroidStats(
        Tables.embeddings(s, d).filter(!(col("vec_id") % 5 === 4))
          .select(col("label").cast("long").as("clabel"),
            vecD(col("embedding")).as("v")), "clabel")
        .write.mode("overwrite").parquet(p)
    }

  /** Force-build the Similarity sidecar (the s09/s10 centroid index)
    * for input `d` — Bench warmup hook; see Dedup.warmStores for why a
    * best-of-1 sweep must not charge the once-per-JVM store build to
    * the first gated consumer.
    */
  private[graft] def warmStores(s: SparkSession, d: String): Unit = {
    centroidStore(s, d); ()
  }

  /** PQ-reconstructed corpus (vec_id, rv, drv): md5-derived seed codebook
    * → one distributed Lloyd step (per-cell exact decimal-sum mean —
    * bit-equal across engines and partitionings; empty cells fall back to
    * the seed centroid) → re-encode every vector as its 8 nearest
    * sub-centroids. Shared by s06 (whole-corpus ADC) and s07 (IVF-pruned
    * ADC). The 8-double sub-vector slivers materialize ONCE for the two
    * assignment passes (train + re-encode) via an eager localCheckpoint:
    * RDD-level blocks the ContextCleaner reclaims when the query drops
    * its references, with nothing registered in the session CacheManager —
    * so tests, direct library use, and s07 all see a clean cache with no
    * runner clearCache contract.
    */
  private def pqReconstruct(e: DataFrame): DataFrame = {
    val cb0 = pqSeedCodebook(e.sparkSession)
    val sub = e.select(col("vec_id"),
        explode(sequence(lit(0), lit(PqM - 1))).as("m"),
        col("v"), col("nrm"))
      .select(col("vec_id"), col("m"),
        transform(slice(col("v"), col("m") * PqSubDim + 1, lit(PqSubDim)),
          x => x / col("nrm")).as("subv"))
      .localCheckpoint(true)
    val a0 = pqAssign(sub, cb0)
    val trained = exactMeanVec(a0.select(col("m"), col("k"), col("subv")),
      Seq("m", "k"), "subv", PqSubDim, "tc")
    val cb1 = cb0.join(trained, Seq("m", "k"), "left")
      .select(col("m"), col("k"), coalesce(col("tc"), col("c")).as("c"))
    pqAssign(sub, cb1).groupBy("vec_id")
      .agg(array_sort(collect_list(struct(col("m"), col("c")))).as("cs"))
      .select(col("vec_id"),
        flatten(transform(col("cs"), p => p.getField("c"))).as("rv"))
      .withColumn("drv", dotFast(col("rv"), col("rv")))
  }

  /** The IVF-pruned ADC input of s07 (one row per (query, corpus vector in
    * the query's probed list)): queries pick their nearest exact coarse
    * centroid (s03's probe), the PQ-reconstructed corpus re-attaches its
    * inverted-list label, and the join on label = probe_label drops every
    * corpus row outside a probed list BEFORE any distance work. Exposed
    * for the plan-shape spec, which asserts the row count equals the
    * probed lists' sizes — i.e. the ADC stage really scans one list, not
    * the corpus.
    */
  private[graft] def ivfpqAdcInput(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    graft.plans.VectorExpressions.register(s)
    val v = e.select(col("vec_id"), col("label").cast("long").as("label"),
      vecD(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(dotFast(col("v"), col("v"))))
    val cent = coarseCentroids(v.select(col("label"), col("v")), "label")
    val q0 = v.filter(col("vec_id") % 50 === 0 && col("vec_id") < 2000)
      .select(col("vec_id").as("query_id"), col("v").as("qv0"), col("nrm").as("qn"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("ccos").desc, col("label").asc)
    val probe = q0.crossJoin(broadcast(cent))
      .withColumn("ccos",
        dotFast(col("qv0"), col("cent")) / (col("qn") * col("cnrm")))
      .withColumn("crank", row_number().over(wProbe))
      .filter(col("crank") === 1)
      .select(col("query_id"),
        transform(col("qv0"), x => x / col("qn")).as("qv"),
        col("label").as("probe_label"))
      .withColumn("dq", dotFast(col("qv"), col("qv")))
    val rec = pqReconstruct(v)
    rec.join(v.select(col("vec_id"), col("label")), Seq("vec_id"))
      .join(broadcast(probe), col("label") === col("probe_label"))
      .filter(col("vec_id") =!= col("query_id"))
  }

  /** md5-derived seed codebook as a 128-row broadcastable frame (m, k, c):
    * coordinate (m, k, i) mirrors the oracle's
    * `('0x'||substr(md5('pq_m_k_i'),1,15))::BIGINT % 2001` arithmetic
    * (coordinates 1-based like the hyperplanes).
    */
  private def pqSeedCodebook(s: SparkSession): DataFrame = {
    import s.implicits._
    (for { m <- 0 until PqM; k <- 0 until PqK } yield
      (m, k, (1 to PqSubDim).map(i =>
        (graft.functions.Portable.h60Scala(s"pq_${m}_${k}_${i}") % 2001L
          - 1000L).toDouble / 1000.0)))
      .toDF("m", "k", "c")
  }

  /** Nearest-centroid assignment of sub-vectors to a codebook: broadcast
    * the 128-row codebook onto the (vec_id, m, subv) frame, d² from three
    * pinned dot folds, argmin ties to the LOWER k (`ORDER BY d2, k` in
    * both engines; (d2, k) pairs are unique per group so the lexicographic
    * struct-min is exact). The argmin is `min(struct(d2, k, …))` — a
    * regular aggregate that PARTIALLY combines map-side, so the shuffle
    * carries one best-so-far row per (vec, subspace) instead of all 16
    * candidates that a row_number window would sort.
    */
  private def pqAssign(sub: DataFrame, cb: DataFrame): DataFrame = {
    sub.join(broadcast(cb), Seq("m"))
      .withColumn("d2",
        dotFast(col("subv"), col("subv"))
          - lit(2.0) * dotFast(col("subv"), col("c"))
          + dotFast(col("c"), col("c")))
      .groupBy("vec_id", "m")
      .agg(min(struct(col("d2"), col("k"), col("subv"), col("c"))).as("best"))
      .select(col("vec_id"), col("m"), col("best.k").as("k"),
        col("best.subv").as("subv"), col("best.c").as("c"))
  }
}
