package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.{Q, Tables}
import graft.functions.Portable._

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (64-dim float vectors).
  *
  *  - s01: brute-force cosine top-k — the exactness baseline. The query set
  *    is broadcast against the corpus, the dot product is a fused codegen'd
  *    fold (no UDF), and top-k per query is a window row_number whose
  *    partial sort AQE keeps per-partition. Cost is |Q|·|corpus|·dim —
  *    right up to ~10^10 cell ops, after which s02 takes over.
  *  - s02: random-hyperplane LSH — the 100 TB path. Each vector gets a
  *    sign-bucket from 8 md5-derived hyperplanes (deterministic, so the
  *    oracle regenerates them); search touches only the query's bucket
  *    (~1/256 of the corpus). Recall tunes with planes/probes; the same
  *    plan shape serves multi-probe by unioning neighbor buckets.
  *
  * Both return (query_id, rank, neighbor_id) — rank ties broken by
  * neighbor id, cosine computed in double with pinned left-to-right
  * accumulation so the DuckDB oracle reproduces the exact ordering.
  */
object Similarity {

  private val Dim = 64

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

  val registry: Seq[Q] = Seq(

    Q("s01_knn_bruteforce",
      "exact cosine top-5 neighbors for the query set (vec_id % 50 = 0)",
      (s, d) => {
        val e = vectors(s, d)
        val q = e.filter(col("vec_id") % 50 === 0)
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
             |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n WHERE vec_id % 50 = 0),
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
    // union more lists). Centroids are computed with a PINNED summation
    // order (sort by vec_id, left fold) so both engines derive bit-equal
    // centroids — the usual avg() would be partition-order-dependent and
    // break the oracle. Centroid table is a broadcast dim; at 100 TB the
    // lists are the partitioning key of the vector store.
    Q("s03_knn_ivf",
      "IVF ANN: probe nearest exact-centroid cluster, top-3 within its list",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        graft.plans.VectorExpressions.register(s)
        val v = e.select(col("vec_id"), col("label").cast("long").as("label"),
          vecD(col("embedding")).as("v"))
          .withColumn("nrm", sqrt(dotFast(col("v"), col("v"))))
        val cent = v.groupBy("label")
          .agg(count(lit(1)).as("cnt"),
            array_sort(collect_list(struct(col("vec_id"), col("v")))).as("vs"))
          .select(col("label"), transform(sequence(lit(1), lit(Dim)), i =>
            aggregate(col("vs"), lit(0.0),
              (acc, p) => acc + element_at(p.getField("v"), i)) / col("cnt"))
            .as("cent"))
          .withColumn("cnrm", sqrt(dotFast(col("cent"), col("cent"))))
        val q = v.filter(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("query_id"), col("v").as("qv"),
            col("nrm").as("qn"))
        val wProbe = Window.partitionBy(col("query_id"))
          .orderBy(col("ccos").desc, col("label").asc)
        val probe = q.crossJoin(broadcast(cent))
          .withColumn("ccos",
            dotFast(col("qv"), col("cent")) / (col("qn") * col("cnrm")))
          .withColumn("crank", row_number().over(wProbe))
          .filter(col("crank") === 1)
          .select(col("query_id"), col("qv"), col("qn"),
            col("label").as("probe_label"))
        val wTop = Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("vec_id").asc)
        v.join(broadcast(probe), col("label") === col("probe_label"))
          .filter(col("vec_id") =!= col("query_id"))
          .withColumn("cosine",
            dotFast(col("v"), col("qv")) / (col("nrm") * col("qn")))
          .withColumn("rank", row_number().over(wTop))
          .filter(col("rank") <= 3)
          .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
            col("probe_label"))
          .orderBy("query_id", "rank")
      },
      Some(s"""$sqlVectors,
             |v AS (SELECT vec_id, label::BIGINT AS label, v, nrm FROM (
             |  SELECT e2.vec_id, e2.label, n.v, n.nrm
             |  FROM embeddings e2 JOIN n ON e2.vec_id = n.vec_id)),
             |cent0 AS (SELECT label, count(*) AS cnt,
             |    list(v ORDER BY vec_id) AS vs FROM v GROUP BY label),
             |cent AS (SELECT label,
             |    list_transform(range(1, 65), i ->
             |      list_reduce(list_prepend(0.0::DOUBLE,
             |        list_transform(vs, p -> p[i])), (a, b) -> a + b) / cnt) AS cent
             |  FROM cent0),
             |centn AS (SELECT label, cent,
             |    sqrt(list_reduce(list_transform(range(1, 65), i -> cent[i] * cent[i]),
             |      (x, y) -> x + y)) AS cnrm FROM cent),
             |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM v WHERE vec_id % 50 = 0),
             |probe0 AS (SELECT q.query_id, q.qv, q.qn, c.label,
             |    list_reduce(list_transform(range(1, 65), i -> q.qv[i] * c.cent[i]), (x, y) -> x + y)
             |      / (q.qn * c.cnrm) AS ccos
             |  FROM q CROSS JOIN centn c),
             |probe AS (SELECT query_id, qv, qn, label AS probe_label FROM (
             |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY ccos DESC, label) AS crank
             |    FROM probe0) WHERE crank = 1),
             |scored AS (SELECT p.query_id, v.vec_id AS neighbor_id, p.probe_label,
             |    list_reduce(list_transform(range(1, 65), i -> v.v[i] * p.qv[i]), (x, y) -> x + y)
             |      / (v.nrm * p.qn) AS cosine
             |  FROM v JOIN probe p ON v.label = p.probe_label
             |  WHERE v.vec_id <> p.query_id),
             |ranked AS (SELECT query_id, neighbor_id, probe_label,
             |  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
             |FROM scored)
             |SELECT query_id, rank, neighbor_id, probe_label FROM ranked
             |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin)),

    // Vector quantization / cluster assignment — the build step of the IVF
    // index (one k-means assignment iteration): every vector goes to its
    // nearest exact centroid. Centroid derivation shares s03's pinned-order
    // fold; assignment is a broadcast cross join (k centroids) + one window,
    // i.e. O(n·k·dim) codegen'd dots with NO shuffle of the corpus — at
    // 100 TB the corpus stays put and only the k×dim centroid table moves.
    Q("s04_centroid_assign",
      "assign each vector to its nearest exact-centroid cluster",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        graft.plans.VectorExpressions.register(s)
        val v = e.select(col("vec_id"), col("label").cast("long").as("own_label"),
          vecD(col("embedding")).as("v"))
          .withColumn("nrm", sqrt(dotFast(col("v"), col("v"))))
        val cent = v.groupBy(col("own_label").as("clabel"))
          .agg(count(lit(1)).as("cnt"),
            array_sort(collect_list(struct(col("vec_id"), col("v")))).as("vs"))
          .select(col("clabel"), transform(sequence(lit(1), lit(Dim)), i =>
            aggregate(col("vs"), lit(0.0),
              (acc, p) => acc + element_at(p.getField("v"), i)) / col("cnt"))
            .as("cent"))
          .withColumn("cnrm", sqrt(dotFast(col("cent"), col("cent"))))
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
             |cent0 AS (SELECT own_label AS clabel, count(*) AS cnt,
             |    list(v ORDER BY vec_id) AS vs FROM v GROUP BY own_label),
             |cent AS (SELECT clabel,
             |    list_transform(range(1, 65), i ->
             |      list_reduce(list_prepend(0.0::DOUBLE,
             |        list_transform(vs, p -> p[i])), (a, b) -> a + b) / cnt) AS cent
             |  FROM cent0),
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
        val q = e.filter(col("vec_id") % 50 === 0)
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
             |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn, bucket FROM b WHERE vec_id % 50 = 0),
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
        val q = e.filter(col("vec_id") % 50 === 0)
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
             |q0 AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn, bucket FROM b WHERE vec_id % 50 = 0),
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
             |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin))
  )
}
