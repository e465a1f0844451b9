package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.{Q, Tables}
import graft.functions.Portable.{h60, tokens}

/** Multimodal-column plumbing for a training-data pipeline: media payloads
  * as opaque `binary` columns with typed metadata, processed by a
  * per-partition decode stage.
  *
  * The container has no image/audio codecs, so the decode kernel is a
  * clearly-marked DETERMINISTIC FAKE (byte-arithmetic on the payload); the
  * Spark-side plumbing is real and is the point:
  *  - a typed `Dataset[MediaRecord]` with a `binary` payload column — the
  *    schema a parquet media lake would have (payload + mime + id);
  *  - decode/feature-extract runs in `mapPartitions`, the JVM twin of
  *    `mapInPandas`: one iterator pass per partition, so a native decoder
  *    (libjpeg/ffmpeg via JNI) amortizes init per partition and memory
  *    stays bounded by one record batch;
  *  - frame sampling is a flatMap explosion (one row per sampled frame) —
  *    downstream per-frame ops (embedding, dedup) join on (doc_id,
  *    frame_idx).
  *
  * At 100 TB: payloads dominate bytes → store them in their own parquet
  * column (columnar pruning skips them unless decoded), partition by
  * content hash for even decode load, and never collect payloads to the
  * driver. The fake kernel's arithmetic is reproduced by the DuckDB oracle
  * over the source text bytes, so the whole path is hash-verified.
  */
object Multimodal {

  final case class MediaRecord(doc_id: Long, payload: Array[Byte], mime: String)
  final case class MediaMeta(doc_id: Long, n_bytes: Long, cp_sum16: Long,
      codec: String, width: Long, height: Long, resized_w: Long,
      resized_h: Long, n_frames: Long)
  final case class Frame(doc_id: Long, frame_idx: Long, frame_tag: Long)

  /** Build the media lake view: documents' text bytes stand in for media
    * payloads (deterministic, so results are verifiable).
    */
  def mediaRecords(s: SparkSession, d: String): Dataset[MediaRecord] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"), col("source"))
      .as[(Long, String, String)]
      .map { case (id, text, source) =>
        // null text ≡ empty payload (the Kernels.lowerTokens contract)
        MediaRecord(id, (if (text == null) "" else text).getBytes("UTF-8"),
          s"media/$source")
      }
  }

  /** FAKE decode kernel — stands in for a libjpeg/ffmpeg probe. Reads only
    * the payload; all derived values are pure functions of it.
    *
    * Byte-vs-codepoint pinning: `n_bytes`/`n_frames` come from the raw
    * payload byte length (oracle: `octet_length(encode(text))`), while the
    * content checksum `cp_sum16` is pinned to UNICODE CODEPOINTS of the
    * decoded text (oracle: `unicode(substr(text, i, 1))`) — byte-level
    * sums would need blob indexing DuckDB doesn't expose, and a 16-byte
    * prefix can split a multibyte character. Locked by a non-ASCII spec.
    */
  private[operators] def decodeOne(r: MediaRecord): MediaMeta = {
    val text = new String(r.payload, "UTF-8")
    val cps = text.codePoints().limit(16).toArray
    val bs = cps.map(_.toLong).sum
    val w = 64 + (bs * 31) % 1857
    val h = 64 + (bs * 17) % 1017
    // fake resize: cap the long edge at 256, integer-exact aspect scaling
    // (pure integer math so the oracle reproduces it bit-for-bit)
    val (rw, rh) =
      if (w <= 256 && h <= 256) (w, h)
      else if (w >= h) (256L, h * 256 / w)
      else (w * 256 / h, 256L)
    MediaMeta(
      doc_id = r.doc_id,
      n_bytes = r.payload.length.toLong,
      cp_sum16 = bs,
      codec = Seq("jpeg", "png", "webp")((bs % 3).toInt),
      width = w,
      height = h,
      resized_w = rw,
      resized_h = rh,
      n_frames = r.payload.length / 100 + 1)
  }

  /** Decode/feature-extract stage: one iterator pass per partition
    * (`mapInPandas` batch shape; a real decoder would init its native
    * context once here, before the iterator is consumed).
    */
  def decode(ds: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it => it.map(decodeOne) }
  }

  /** Frame sampling: every 7th frame index, tagged with a per-frame hash
    * (stand-in for a per-frame feature vector). The cp_sum16-mod-997 tag
    * is m02's pinned fixture constant; m07 derives its own
    * full-content-entropy fingerprint tags instead (see its doc).
    */
  def sampleFrames(ds: Dataset[MediaMeta]): Dataset[Frame] = {
    import ds.sparkSession.implicits._
    ds.flatMap { m =>
      (0L until m.n_frames by 7).map { f =>
        Frame(m.doc_id, f, (m.cp_sum16 * 2654435761L + f) % 997)
      }
    }
  }

  /** ceil(log2(max(n, 2))) via bit length — INTEGER-exact, because its
    * DuckDB twin `length(bin(GREATEST(n, 2) - 1))` must agree bit-for-bit
    * (a float log2 could round either side of an integer at powers of
    * two and silently split the engines' adaptive widths).
    */
  private def ceilLog2(n: Long): Long =
    64L - java.lang.Long.numberOfLeadingZeros(math.max(n, 2L) - 1L)

  /** The corpus count all three adaptive-width formulas key on — the
    * raw documents row count (one column-less count job, shared
    * convention with the oracle's `count(*) FROM documents`).
    */
  private def docCount(s: SparkSession, d: String): Long =
    Tables.documents(s, d).count()

  /** Adaptive pHash band width in bits (the sketch is 2 bands = 2·bb
    * bits): 8 while the corpus holds ≤ 4096 docs — the gate SFs, where
    * the hashes stay pinned to the original 16-bit sketch — then
    * ceil(log2 n) − 4, so a band bucket holds ~2⁴ sketches REGARDLESS
    * of corpus size and band-collision candidates stay output-bound
    * (~16n) instead of saturating at n²/256. This is the production
    * "widen the hash with the corpus" lever (16 → 64-bit pHash at crawl
    * scale), s18's adaptive-plane precedent applied to m08/m11.
    * DuckDB twin: [[sqlPhashWidth]].
    */
  private def phashBandBits(n: Long): Long = math.max(8L, ceilLog2(n) - 4L)

  /** Adaptive m07 frame-tag modulus: 997 while the corpus holds ≤ 1024
    * videos (gate SFs pinned), then doubling with each corpus doubling,
    * so videos-per-tag — and with it the tag pair join's fan-out —
    * stays constant instead of growing linearly (pairs ~n²/997).
    * DuckDB twin: [[sqlTagMod]].
    */
  private def adaptiveTagMod(n: Long): Long =
    997L << math.max(0L, ceilLog2(n) - 10L).toInt

  /** Oracle twin of [[phashBandBits]] — a 1-row CTE `wp(bb)`. */
  private val sqlPhashWidth =
    """wp AS (SELECT GREATEST(8, length(bin(GREATEST(cnt, 2) - 1)) - 4) AS bb
      |  FROM (SELECT count(*)::BIGINT AS cnt FROM documents))""".stripMargin

  /** Oracle twin of [[adaptiveTagMod]] — a 1-row CTE `mp(m)`. */
  private val sqlTagMod =
    """mp AS (SELECT 997 * (1::BIGINT <<
      |    GREATEST(0, length(bin(GREATEST(cnt, 2) - 1)) - 10)) AS m
      |  FROM (SELECT count(*)::BIGINT AS cnt FROM documents))""".stripMargin

  final case class AudioFrame(doc_id: Long, frame_idx: Long, energy: Long,
      peak: Long)

  /** Audio-style windowed feature extraction: fixed-size frames (64
    * "samples", hop 32 — the 25 ms / 10 ms MFCC framing shape) over the
    * payload's decoded codepoint stream, per-frame energy (Σ s²) and peak.
    * A real pipeline swaps the codepoint stream for PCM samples and the
    * two features for a filterbank — the plumbing (one decode per record,
    * frames emitted per partition pass, downstream ops keyed on
    * (doc_id, frame_idx)) is what carries to 100 TB: frames never
    * materialize as a per-doc array column (the measured 10× cache trap),
    * and records shorter than one frame emit nothing rather than padding.
    */
  def audioFrames(ds: Dataset[MediaRecord], frame: Int = 64,
      hop: Int = 32): Dataset[AudioFrame] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.flatMap { r =>
        val cps = new String(r.payload, "UTF-8").codePoints().toArray
        val n = cps.length
        val nFrames = if (n < frame) 0 else (n - frame) / hop + 1
        (0 until nFrames).iterator.map { f =>
          val st = f * hop
          var e = 0L
          var p = 0L
          var i = st
          while (i < st + frame) {
            val c = cps(i).toLong
            e += c * c
            if (c > p) p = c
            i += 1
          }
          AudioFrame(r.doc_id, f.toLong, e, p)
        }
      }
    }
  }

  final case class Patch(doc_id: Long, patch_row: Long, patch_col: Long,
      patch_sum: Long, patch_max: Long)

  /** ViT-style patch grid: the payload's first 256 decoded codepoints as a
    * 16×16 "image", split into a 4×4 grid of 4×4 patches with per-patch
    * sum and max (stand-ins for the patch embedding a vision tower would
    * compute). Records shorter than one image emit nothing. The plumbing
    * is the point: patches explode to rows keyed (doc_id, row, col), the
    * unit downstream similarity/dedup ops join on — at 100 TB patch rows
    * feed straight into the s-ops' ANN pipeline without re-decoding.
    */
  def patchGrid(ds: Dataset[MediaRecord], side: Int = 16,
      patch: Int = 4): Dataset[Patch] = {
    import ds.sparkSession.implicits._
    val grid = side / patch
    ds.mapPartitions { it =>
      it.flatMap { r =>
        val cps = new String(r.payload, "UTF-8").codePoints().toArray
        if (cps.length < side * side) Iterator.empty
        else (0 until grid * grid).iterator.map { p =>
          val pr = p / grid
          val pc = p % grid
          var sum = 0L
          var max = 0L
          var i = 0
          while (i < patch * patch) {
            val c = cps((pr * patch + i / patch) * side + pc * patch
              + i % patch).toLong
            sum += c
            if (c > max) max = c
            i += 1
          }
          Patch(r.doc_id, pr.toLong, pc.toLong, sum, max)
        }
      }
    }
  }

  private val sqlMeta =
    """WITH m AS (SELECT doc_id, text,
      |  octet_length(encode(text))::BIGINT AS n_bytes,
      |  list_aggregate(list_transform(range(1, least(length(text), 16) + 1),
      |    i -> unicode(substr(text, i, 1))), 'sum')::BIGINT AS cp_sum16
      |FROM documents)""".stripMargin

  /** The m05/m06 retrieval column: each decoded image's 16 patch sums,
    * flattened row-major, as a normalized embedding (doc_id, v, nrm) —
    * the stand-in for a vision tower's pooled output. Patch sums are
    * 16-codepoint integer sums < 2^25, so every dot-product partial
    * (< 2^53) is exactly representable in double — cosines and
    * hyperplane signs are bit-identical across engines with no decimal
    * hop. At 100 TB the build rides the decode scan: no shuffle before
    * the 16-double vectors (~128 B/doc).
    */
  private def patchVectors(s: SparkSession, d: String): DataFrame = {
    graft.plans.VectorExpressions.register(s)
    import graft.functions.Portable.dotFast
    val vecAggs = (0 until 16).map(p =>
      max(when(col("patch_row") === p / 4 && col("patch_col") === p % 4,
        col("patch_sum"))).as(s"p_$p"))
    patchGrid(mediaRecords(s, d)).toDF()
      .groupBy("doc_id").agg(vecAggs.head, vecAggs.tail: _*)
      .select(col("doc_id"),
        array((0 until 16).map(p => col(s"p_$p").cast("double")): _*)
          .as("v"))
      .withColumn("nrm", sqrt(dotFast(col("v"), col("v"))))
  }

  /** CENTERED patch-vector SimHash sketch per decodable image (one
    * long/doc, checkpointed) — m08's pHash, factored so the m11
    * screen→verify composition reuses the identical sketch. Width =
    * 2·[[phashBandBits]] bits, derived from the corpus count (16 at the
    * gate SFs). Centering (subtracting the vector's own mean) is what
    * makes the sign pattern discriminative: raw patch sums are
    * all-positive and cluster near the all-ones direction (§7.4-13).
    */
  private def imageSketches(s: SparkSession, d: String,
      bandBits: Long): DataFrame =
    imageSketchesOf(patchVectors(s, d), bandBits)

  /** [[imageSketches]] over an arbitrary patch-vector frame — the form
    * m11 needs so its verify leg and the sketch share ONE checkpointed
    * kernel pass instead of each paying the decode+grid scan.
    */
  private def imageSketchesOf(pv: DataFrame, bandBits: Long): DataFrame = {
    import graft.functions.Portable.{centerFast, dotFast, hyperplaneArray}
    // centerFast (one O(d) expression node), NOT the per-element
    // array(v[i] − vbar) spelling: CollapseProject inlines that mean
    // into all 16 elements and the 16 sign tests re-inline the array —
    // O(d³) generated code that breaks the janino 64 KB method limit
    val sig = (0 until (2 * bandBits).toInt).map { j =>
      when(dotFast(col("cv"),
        typedlit(hyperplaneArray(j, 16).toSeq)) >= 0.0,
        lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    pv
      .select(col("doc_id"), centerFast(col("v")).as("cv"))
      .select(col("doc_id"), sig.as("sig"))
      .localCheckpoint(true)
  }

  /** Banded sketch-collision pairs with their Hamming distance — the
    * shared candidate stage of m08 (kept at <= 1, the 2-band pigeonhole
    * losslessness radius) and m11 (screened at <= 2, a deliberate
    * margin past losslessness — documented best-effort, the d23 scope
    * discipline). One merge-hinted self-join on the 2×bandBits-bit band
    * keys; the distinct pair set is candidate-bound — and with
    * [[phashBandBits]] sizing the bands, OUTPUT-bound at every corpus
    * size, not just below the 16-bit saturation point.
    */
  private def sketchPairs(s: SparkSession, d: String,
      bandBits: Long): DataFrame =
    sketchPairsOf(imageSketches(s, d, bandBits), bandBits)

  private def sketchPairsOf(sk: DataFrame, bandBits: Long): DataFrame = {
    val mask = (1L << bandBits) - 1L
    val bands = sk.select(col("doc_id"), col("sig"),
      explode(array((0 until 2).map(j =>
        xxhash64(lit(j), shiftright(col("sig"), (bandBits * j).toInt)
          .bitwiseAND(lit(mask)))): _*)).as("bkey"))
    bands.as("x").hint("merge").join(bands.as("y"), Seq("bkey"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.sig").as("sa"), col("y.sig").as("sb"))
      .distinct()
      .withColumn("hamming",
        bit_count(col("sa").bitwiseXOR(col("sb"))).cast("long"))
  }

  /** DuckDB twin of [[patchVectors]] (CTEs cps → vec → n). */
  private val sqlPatchVectors =
    """WITH cps AS (SELECT doc_id,
      |    list_transform(range(1, length(text) + 1),
      |      i -> unicode(substr(text, i, 1))::BIGINT) AS cp
      |  FROM documents WHERE length(text) >= 256),
      |vec AS (SELECT doc_id, list_transform(range(0, 16), p ->
      |    list_aggregate(list_transform(range(0, 16),
      |      i -> cp[((p // 4) * 4 + i // 4) * 16 + (p % 4) * 4 + (i % 4) + 1]),
      |      'sum')::DOUBLE) AS v
      |  FROM cps),
      |n AS (SELECT doc_id, v,
      |    sqrt(list_reduce(list_transform(range(1, 17), i -> v[i] * v[i]),
      |      (x, y) -> x + y)) AS nrm
      |  FROM vec)""".stripMargin

  val registry: Seq[Q] = Seq(

    Q("m01_media_decode",
      "binary payload -> typed media metadata via per-partition decode stub",
      (s, d) => decode(mediaRecords(s, d)).toDF().orderBy("doc_id"),
      Some(s"""$sqlMeta,
             |dims AS (SELECT doc_id, n_bytes, cp_sum16,
             |    64 + (cp_sum16 * 31) % 1857 AS width,
             |    64 + (cp_sum16 * 17) % 1017 AS height
             |  FROM m)
             |SELECT doc_id,
             |  n_bytes,
             |  cp_sum16,
             |  (['jpeg', 'png', 'webp'])[(cp_sum16 % 3) + 1] AS codec,
             |  width, height,
             |  CASE WHEN width <= 256 AND height <= 256 THEN width
             |       WHEN width >= height THEN 256
             |       ELSE width * 256 // height END AS resized_w,
             |  CASE WHEN width <= 256 AND height <= 256 THEN height
             |       WHEN width >= height THEN height * 256 // width
             |       ELSE 256 END AS resized_h,
             |  n_bytes // 100 + 1 AS n_frames
             |FROM dims ORDER BY doc_id""".stripMargin)),

    Q("m02_frame_sample",
      "frame sampling: every 7th frame exploded to (doc_id, frame_idx, tag)",
      (s, d) => sampleFrames(decode(mediaRecords(s, d))).toDF()
        .orderBy("doc_id", "frame_idx"),
      Some(s"""$sqlMeta,
             |f AS (SELECT doc_id, cp_sum16,
             |  unnest(range(0, n_bytes // 100 + 1, 7)) AS frame_idx
             |FROM m)
             |SELECT doc_id, frame_idx,
             |  (cp_sum16 * 2654435761 + frame_idx) % 997 AS frame_tag
             |FROM f ORDER BY doc_id, frame_idx""".stripMargin)),

    // The oracle decodes the same codepoint stream (length() and unicode()
    // are codepoint-exact in DuckDB) and recomputes each frame's fold;
    // squares go through BIGINT so supplementary-plane codepoints can't
    // overflow INT32 in either engine.
    Q("m03_audio_features",
      "windowed feature extraction: 64-cp frames, hop 32, energy + peak per frame",
      (s, d) => audioFrames(mediaRecords(s, d)).toDF()
        .orderBy("doc_id", "frame_idx"),
      Some("""WITH cps AS (SELECT doc_id,
             |    list_transform(range(1, length(text) + 1),
             |      i -> unicode(substr(text, i, 1))::BIGINT) AS cp
             |  FROM documents),
             |fr AS (SELECT doc_id, cp,
             |    unnest(range(0, CASE WHEN len(cp) < 64 THEN 0
             |                         ELSE (len(cp) - 64) // 32 + 1 END)) AS f
             |  FROM cps)
             |SELECT doc_id, f::BIGINT AS frame_idx,
             |  list_aggregate(list_transform(range(f * 32 + 1, f * 32 + 65),
             |    i -> cp[i] * cp[i]), 'sum')::BIGINT AS energy,
             |  list_aggregate(list_transform(range(f * 32 + 1, f * 32 + 65),
             |    i -> cp[i]), 'max')::BIGINT AS peak
             |FROM fr ORDER BY doc_id, frame_idx""".stripMargin)),

    Q("m04_patch_grid",
      "ViT-style patching: 16x16 payload image -> 4x4 grid of 4x4 patches with sum/max",
      (s, d) => patchGrid(mediaRecords(s, d)).toDF()
        .orderBy("doc_id", "patch_row", "patch_col"),
      Some("""WITH cps AS (SELECT doc_id,
             |    list_transform(range(1, length(text) + 1),
             |      i -> unicode(substr(text, i, 1))::BIGINT) AS cp
             |  FROM documents WHERE length(text) >= 256),
             |p AS (SELECT doc_id, cp, unnest(range(0, 16)) AS p FROM cps),
             |cells AS (SELECT doc_id, (p // 4)::BIGINT AS patch_row,
             |    (p % 4)::BIGINT AS patch_col,
             |    list_transform(range(0, 16),
             |      i -> cp[((p // 4) * 4 + i // 4) * 16 + (p % 4) * 4 + (i % 4) + 1]) AS vals
             |  FROM p)
             |SELECT doc_id, patch_row, patch_col,
             |  list_aggregate(vals, 'sum')::BIGINT AS patch_sum,
             |  list_aggregate(vals, 'max')::BIGINT AS patch_max
             |FROM cells ORDER BY doc_id, patch_row, patch_col""".stripMargin)),

    // The multimodal→ANN bridge m04's header promises: [[patchVectors]]
    // searched with the s01 plan — broadcast query side, codegen'd dots,
    // window top-k. The exactness baseline; m06 swaps the index.
    // Query workload is PINNED (doc_id % 50 = 0 AND doc_id < 5000): the
    // id window covers every gate-SF doc (sf0.1 tops out at doc_id
    // 4999 — results there are unchanged) and freezes the query count
    // as the corpus scales past it. The r11 decade sweep measured the
    // un-windowed form at sf0.1→sf1 exponents 1.44 (m05) / 1.54 (m06):
    // a query set proportional to the corpus turns every retrieval leg
    // O(n²/50), which is a statement about the benchmark's workload
    // model, not the plan — retrieval query rate doesn't grow with
    // corpus size. See the Similarity header for the same contract on
    // the vec_id gates.
    Q("m05_patch_knn",
      "multimodal retrieval: m04 patch-sum vectors as embeddings, exact cosine top-3",
      (s, d) => {
        import graft.functions.Portable.dotFast
        val vec = patchVectors(s, d)
        val q = vec.filter(col("doc_id") % 50 === 0 && col("doc_id") < 5000)
          .select(col("doc_id").as("query_doc"), col("v").as("qv"),
            col("nrm").as("qn"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_doc"))
          .orderBy(col("cosine").desc, col("doc_id").asc)
        vec.crossJoin(broadcast(q))
          .filter(col("doc_id") =!= col("query_doc"))
          .withColumn("cosine",
            dotFast(col("v"), col("qv")) / (col("nrm") * col("qn")))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
          .select(col("query_doc"), col("rank"),
            col("doc_id").as("neighbor_doc"), col("cosine"))
          .orderBy("query_doc", "rank")
      },
      Some(s"""$sqlPatchVectors,
             |q AS (SELECT doc_id AS query_doc, v AS qv, nrm AS qn FROM n
             |  WHERE doc_id % 50 = 0 AND doc_id < 5000),
             |scored AS (SELECT q.query_doc, n.doc_id AS neighbor_doc,
             |    list_reduce(list_transform(range(1, 17), i -> n.v[i] * q.qv[i]),
             |      (x, y) -> x + y) / (n.nrm * q.qn) AS cosine
             |  FROM n JOIN q ON n.doc_id <> q.query_doc),
             |ranked AS (SELECT query_doc, neighbor_doc, cosine,
             |  row_number() OVER (PARTITION BY query_doc ORDER BY cosine DESC, neighbor_doc) AS rank
             |FROM scored)
             |SELECT query_doc, rank, neighbor_doc, cosine FROM ranked
             |WHERE rank <= 3 ORDER BY query_doc, rank""".stripMargin)),

    // The index swap m05's comment promises, DEMONSTRATED: the same
    // [[patchVectors]] column searched with s02's sign-LSH index —
    // 8 md5-derived hyperplanes (the shared Portable.hyperplaneArray
    // family, instantiated at dim 16) bucket the corpus into 256 sign
    // patterns; search touches only the query's bucket (~1/256 of the
    // corpus), probe side broadcast, corpus never reshuffles. Hyperplane
    // signs are exact (integer patch sums ⇒ every dot partial exact in
    // double), so bucket assignment — and therefore the result set — is
    // bit-identical across engines, and the oracle regenerates the
    // planes from the same md5 arithmetic. At 100 TB this is the
    // retrieval shape: vector build rides the decode scan, the bucket
    // column is the vector store's partition key, a query reads one
    // partition.
    Q("m06_patch_knn_lsh",
      "multimodal retrieval, indexed: m05's vectors under s02's sign-LSH buckets (top-3 in-bucket)",
      (s, d) => {
        import graft.functions.Portable.{dotFast, hyperplaneArray}
        val bucket = (0 until 8).map { j =>
          when(dotFast(col("v"), typedlit(hyperplaneArray(j, 16).toSeq)) >= 0.0,
            lit(1L << j)).otherwise(lit(0L))
        }.reduce(_ + _)
        val vec = patchVectors(s, d).withColumn("bucket", bucket)
        val q = vec.filter(col("doc_id") % 50 === 0 && col("doc_id") < 5000)
          .select(col("doc_id").as("query_doc"), col("v").as("qv"),
            col("nrm").as("qn"), col("bucket"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_doc"))
          .orderBy(col("cosine").desc, col("doc_id").asc)
        vec.join(broadcast(q), Seq("bucket"))
          .filter(col("doc_id") =!= col("query_doc"))
          .withColumn("cosine",
            dotFast(col("v"), col("qv")) / (col("nrm") * col("qn")))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
          .select(col("query_doc"), col("rank"),
            col("doc_id").as("neighbor_doc"), col("bucket"))
          .orderBy("query_doc", "rank")
      },
      Some(s"""$sqlPatchVectors,
             |b AS (SELECT doc_id, v, nrm,
             |  list_reduce(list_transform(range(0, 8), j ->
             |    CASE WHEN list_reduce(list_transform(range(1, 17), i -> v[i] *
             |        ((('0x' || substr(md5('hp_' || j || '_' || i), 1, 15))::BIGINT % 2001 - 1000) / 1000.0)),
             |        (x, y) -> x + y) >= 0.0
             |      THEN CAST(power(2, j) AS BIGINT) ELSE 0 END), (x, y) -> x + y) AS bucket
             |FROM n),
             |q AS (SELECT doc_id AS query_doc, v AS qv, nrm AS qn, bucket FROM b
             |  WHERE doc_id % 50 = 0 AND doc_id < 5000),
             |scored AS (SELECT q.query_doc, b.doc_id AS neighbor_doc, b.bucket,
             |    list_reduce(list_transform(range(1, 17), i -> b.v[i] * q.qv[i]),
             |      (x, y) -> x + y) / (b.nrm * q.qn) AS cosine
             |  FROM b JOIN q USING (bucket) WHERE b.doc_id <> q.query_doc),
             |ranked AS (SELECT query_doc, neighbor_doc, bucket,
             |  row_number() OVER (PARTITION BY query_doc ORDER BY cosine DESC, neighbor_doc) AS rank
             |FROM scored)
             |SELECT query_doc, rank, neighbor_doc, bucket FROM ranked
             |WHERE rank <= 3 ORDER BY query_doc, rank""".stripMargin)),

    // Cross-video duplicate-FRAME overlap — the video-dedup primitive
    // (shared keyframes mark re-uploads, clips, and edits of the same
    // footage): sampled frame FINGERPRINTS stand in for perceptual
    // frame hashes, and video pairs are scored by how many distinct tags
    // they share — d07's capped set-overlap shape at frame granularity.
    // Hot tags (a tag present in more than 25% of videos — intros,
    // color bars, black frames) are capped OUT before the pair join,
    // integer-exact (tf * 4 <= nvids): at 100 TB a tag in f videos
    // contributes f² pair rows, and the universal-frame tags carry no
    // identity signal — the d07 rationale verbatim. Tag design carries
    // the scale story, two halves that only work TOGETHER: (1) the tag
    // derives from an h60 fingerprint of the WHOLE payload plus the
    // frame index — m02's cp_sum16 basis (a 16-codepoint sum) has only
    // ~1.5k distinct values, so at 50k+ videos every bucket held
    // ~n/1500 videos and the pair join was quadratic regardless of the
    // key space (measured 6.4M pairs at sf1); full-content entropy
    // restores the uniformity the cap and the modulus both assume.
    // (2) The key space is ADAPTIVE (adaptiveTagMod: 997 at the gate
    // SFs, doubling with the corpus), so bucket occupancy n·t̄/M — and
    // with it the join fan-out — stays constant as the corpus grows.
    // True re-uploads still collide on every frame (identical payload
    // ⇒ identical fingerprints). Per-video tag-set sizes re-attach
    // shuffle-hash; the self-join is merge-hinted over one reused
    // exchange, AQE-skew-splittable, never a broadcast of a
    // corpus-sized frame table.
    Q("m07_video_overlap",
      "video pairs sharing a sampled frame fingerprint (adaptive tag space, capped hot tags), with overlap fraction",
      (s, d) => {
        val mTag = adaptiveTagMod(docCount(s, d))
        val fr = Tables.documents(s, d)
          .select(col("doc_id"),
            h60(concat(lit("vfp_"), col("text"))).as("fp"),
            explode(expr(
              "sequence(0L, cast(octet_length(encode(text, 'UTF-8')) as bigint) div 100, 7L)"))
              .as("frame_idx"))
          .select(col("doc_id"),
            ((col("fp") + col("frame_idx") * lit(2654435761L)) % mTag)
              .as("frame_tag"))
          .distinct()
          .localCheckpoint(true)
        val nv = fr.agg(countDistinct(col("doc_id")).as("nvids"))
        val tf = fr.groupBy("frame_tag").agg(count(lit(1)).as("tf"))
        val capped = fr.join(tf.hint("shuffle_hash"), Seq("frame_tag"))
          .crossJoin(broadcast(nv))
          .filter(col("tf") * lit(4) <= col("nvids"))
          .select("doc_id", "frame_tag")
        val sizes = capped.groupBy("doc_id").agg(count(lit(1)).as("ntags"))
        val cp = capped.join(sizes.hint("shuffle_hash"), Seq("doc_id"))
        val a = cp.select(col("doc_id").as("doc_a"),
          col("ntags").as("na"), col("frame_tag"))
        val b = cp.select(col("doc_id").as("doc_b"),
          col("ntags").as("nb"), col("frame_tag"))
        a.hint("merge").join(b, Seq("frame_tag"))
          .filter(col("doc_a") < col("doc_b"))
          .groupBy("doc_a", "doc_b", "na", "nb")
          .agg(count(lit(1)).as("n_shared"))
          .withColumn("overlap",
            col("n_shared") * lit(1.0) / (col("na") + col("nb") - col("n_shared")))
          .select("doc_a", "doc_b", "n_shared", "overlap")
          .orderBy("doc_a", "doc_b")
      },
      Some(s"""$sqlMeta,
             |$sqlTagMod,
             |f AS (SELECT doc_id, text,
             |  unnest(range(0, n_bytes // 100 + 1, 7)) AS frame_idx
             |FROM m),
             |ft AS (SELECT DISTINCT doc_id,
             |  ((('0x' || substr(md5('vfp_' || text), 1, 15))::BIGINT
             |    + frame_idx * 2654435761) % m) AS frame_tag
             |  FROM f CROSS JOIN mp),
             |nv AS (SELECT count(DISTINCT doc_id) AS nvids FROM ft),
             |tf AS (SELECT frame_tag, count(*) AS tf FROM ft GROUP BY 1),
             |capped AS (SELECT doc_id, frame_tag
             |  FROM ft JOIN tf USING (frame_tag) CROSS JOIN nv
             |  WHERE tf.tf * 4 <= nv.nvids),
             |sz AS (SELECT doc_id, count(*)::BIGINT AS ntags FROM capped GROUP BY 1),
             |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_shared
             |  FROM capped a JOIN capped b
             |    ON a.frame_tag = b.frame_tag AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2)
             |SELECT doc_a, doc_b, n_shared,
             |  n_shared * 1.0 / (sa.ntags + sb.ntags - n_shared) AS overlap
             |FROM p
             |  JOIN sz sa ON sa.doc_id = doc_a
             |  JOIN sz sb ON sb.doc_id = doc_b
             |ORDER BY doc_a, doc_b""".stripMargin)),

    // Image near-dup via a perceptual hash — the image-dedup primitive
    // (re-encodes, crops, minor edits collapse to nearby hashes): a
    // sign-SimHash of each image's CENTERED patch vector (v − v̄;
    // raw patch sums are dominated by global magnitude — the un-centered
    // probe collapsed 291 images to 7 signatures, centered gives 268 —
    // the dHash/pHash idea of hashing deviation-from-mean, not
    // brightness). All arithmetic is engine-exact: patch sums are
    // integers < 2^25, v̄ divides by 16 (a power of two — exact), so the
    // centered coords are exact doubles and the hyperplane dot products
    // round identically left-to-right (the m06/d11 contract). Pairing is
    // d11's pigeonhole banding sized to the threshold: Hamming <= 1
    // cannot differ in BOTH halves, so the 2-band join is
    // lossless; candidates are band-bucket-bound, never all-pairs, and
    // the sketch frame (one long/image) eager-checkpoints so the pair
    // plan is sketch-only — at 100 TB the images are read once for the
    // patch kernel and never again. Sketch width ADAPTS to the corpus
    // (phashBandBits: 2×8 bits at the gate SFs — hashes pinned — then
    // 2·(ceil(log2 n) − 4)), so a band bucket holds ~16 sketches at any
    // scale and candidates stay output-bound instead of saturating at
    // n²/256; the wider hash is also WHY precision holds as n grows
    // (accidental 16-bit collisions multiply with the corpus — the
    // production 16 → 64-bit pHash discipline).
    Q("m08_image_neardup",
      "image near-dup pairs: centered patch-vector SimHash at Hamming <= 1 (2 corpus-adaptive bands, lossless)",
      (s, d) => {
        sketchPairs(s, d, phashBandBits(docCount(s, d)))
          .filter(col("hamming") <= 1)
          .select(col("doc_a"), col("doc_b"), col("hamming"))
          .orderBy("doc_a", "doc_b")
      },
      Some(s"""$sqlPatchVectors,
             |$sqlPhashWidth,
             |c AS (SELECT doc_id, v, list_aggregate(v, 'sum') / 16.0 AS vbar FROM n),
             |sk AS (SELECT doc_id,
             |  list_reduce(list_transform(range(0, 2 * bb), j ->
             |    CASE WHEN list_reduce(list_transform(range(1, 17), i -> (v[i] - vbar) *
             |        ((('0x' || substr(md5('hp_' || j || '_' || i), 1, 15))::BIGINT % 2001 - 1000) / 1000.0)),
             |        (x, y) -> x + y) >= 0.0
             |      THEN CAST(power(2, j) AS BIGINT) ELSE 0 END), (x, y) -> x + y) AS sig
             |FROM c CROSS JOIN wp)
             |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |  bit_count(xor(a.sig, b.sig))::BIGINT AS hamming
             |FROM sk a JOIN sk b ON a.doc_id < b.doc_id
             |WHERE bit_count(xor(a.sig, b.sig)) <= 1
             |ORDER BY doc_a, doc_b""".stripMargin)),

    // Interleaved multimodal sequence packing — the training-sequence
    // writer for image+text corpora (LLaVA/Flamingo-style): a document's
    // budget cost is its text tokens PLUS the patch tokens its image
    // contributes (m04's geometry: a decodable >= 256-char payload yields
    // a 4x4 grid = 16 patch tokens; shorter payloads decode to no image),
    // packed greedily into 2048-token sequences within t13's 256-way
    // hash-bucket shards. Same scale stance as t13: parallelism keys on
    // the md5-derived bucket (a knob), never a natural skewed column; one
    // window sort per bucket of ~n/256 rows; the bucket is the output
    // shard a multimodal loader reads. Pure integer arithmetic, so both
    // engines agree exactly; char-length eligibility matches m04's
    // oracle convention (codepoints, not bytes).
    Q("m09_interleaved_pack",
      "multimodal packing: text + ViT patch tokens per doc, 2048-token sequences in 256-way hash shards",
      (s, d) => {
        val t = coalesce(col("text"), lit(""))
        val shard = h60(concat(lit("shard_"), col("doc_id").cast("string"))) % 256
        val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.documents(s, d)
          .select(col("doc_id"), shard.as("shard"),
            size(tokens(t)).cast("long").as("n_text_tokens"),
            when(length(t) >= 256, lit(16L)).otherwise(lit(0L))
              .as("n_patch_tokens"))
          .withColumn("cost", col("n_text_tokens") + col("n_patch_tokens"))
          .withColumn("cum", sum(col("cost")).over(w))
          .select(col("doc_id"), col("shard"),
            col("n_text_tokens"), col("n_patch_tokens"),
            expr("(cum - cost) div 2048").as("seq_id"),
            ((col("cum") - col("cost")) % 2048).as("seq_offset"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id,
             |  ('0x' || substr(md5('shard_' || doc_id), 1, 15))::BIGINT % 256 AS shard,
             |  len(list_filter(string_split(coalesce(text, ''), ' '), x -> x <> ''))::BIGINT AS n_text_tokens,
             |  (CASE WHEN length(coalesce(text, '')) >= 256 THEN 16 ELSE 0 END)::BIGINT AS n_patch_tokens
             |FROM documents),
             |c AS (SELECT *, n_text_tokens + n_patch_tokens AS cost,
             |  (sum(n_text_tokens + n_patch_tokens) OVER (PARTITION BY shard ORDER BY doc_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS cum
             |FROM t)
             |SELECT doc_id, shard, n_text_tokens, n_patch_tokens,
             |  ((cum - cost) // 2048)::BIGINT AS seq_id,
             |  ((cum - cost) % 2048)::BIGINT AS seq_offset
             |FROM c ORDER BY doc_id""".stripMargin)),

    // Shot/segment boundary detection over the decoded frame stream — the
    // video-pipeline step between frame extraction (m02/m03) and sampling:
    // a training pipeline samples per SEGMENT, not per fixed stride, so
    // one static shot can't flood the batch with near-identical frames
    // (the frame-level analogue of d01's dedup rationale). A boundary is
    // a relative energy jump: |e_t − e_{t−1}| · 10 > e_{t−1}, i.e. >10 %
    // change — cross-multiplied INTEGER arithmetic on m03's exact
    // codepoint energies, no float thresholds, so both engines agree
    // bit-for-bit. segment_id is the running cut count, turning the
    // boolean stream into the per-doc segmentation the sampler consumes.
    // Shape: the frame kernel rides the scan (m03's zero-shuffle
    // property), then ONE doc-keyed exchange feeds BOTH stacked windows
    // (lag + running sum share the (doc_id, frame_idx) sort); per-doc
    // frame counts bound every window buffer. At 100 TB: high-cardinality
    // doc key, no join, the same single-exchange class as q41.
    Q("m10_scene_segments",
      "segment boundaries where frame energy jumps >10% (integer cross-multiply); running segment ids",
      (s, d) => {
        val fr = audioFrames(mediaRecords(s, d)).toDF()
        val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
        val wCum = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        fr.withColumn("prev_energy", lag(col("energy"), 1).over(w))
          .withColumn("delta",
            col("energy") - coalesce(col("prev_energy"), col("energy")))
          .withColumn("is_cut",
            abs(col("delta")) * lit(10L) > coalesce(col("prev_energy"), lit(0L)))
          .withColumn("segment_id",
            sum(when(col("is_cut"), 1L).otherwise(0L)).over(wCum))
          .select(col("doc_id"), col("frame_idx"), col("energy"),
            col("delta"), col("is_cut"), col("segment_id"))
          .orderBy("doc_id", "frame_idx")
      },
      Some("""WITH cps AS (SELECT doc_id,
             |    list_transform(range(1, length(text) + 1),
             |      i -> unicode(substr(text, i, 1))::BIGINT) AS cp
             |  FROM documents),
             |fr AS (SELECT doc_id, cp,
             |    unnest(range(0, CASE WHEN len(cp) < 64 THEN 0
             |                         ELSE (len(cp) - 64) // 32 + 1 END)) AS f
             |  FROM cps),
             |en AS (SELECT doc_id, f::BIGINT AS frame_idx,
             |    list_aggregate(list_transform(range(f * 32 + 1, f * 32 + 65),
             |      i -> cp[i] * cp[i]), 'sum')::BIGINT AS energy
             |  FROM fr),
             |lg AS (SELECT doc_id, frame_idx, energy,
             |    lag(energy) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS prev_energy
             |  FROM en),
             |dl AS (SELECT doc_id, frame_idx, energy, prev_energy,
             |    energy - coalesce(prev_energy, energy) AS delta,
             |    abs(energy - coalesce(prev_energy, energy)) * 10 > coalesce(prev_energy, 0) AS is_cut
             |  FROM lg)
             |SELECT doc_id, frame_idx, energy, delta, is_cut,
             |  (sum(CASE WHEN is_cut THEN 1 ELSE 0 END) OVER (PARTITION BY doc_id
             |    ORDER BY frame_idx ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT
             |    AS segment_id
             |FROM dl ORDER BY doc_id, frame_idx""".stripMargin)),

    // The production IMAGE dedup path — m08's sketch screen composed
    // with an exact verify, the d24 screen→verify pattern on the
    // multimodal side. Why the composition earns its place: the 16-bit
    // pHash COLLIDES — measured on this corpus, Hamming-0 pairs span
    // centered-cosine 0.23..1.0 — so sketch-only m08 reports both true
    // duplicates and unrelated images; the verify leg recomputes the
    // exact CENTERED patch-vector cosine over screened pairs only and
    // keeps >= 0.9 (true dups sit ~1.0, the collisions below ~0.82 —
    // the threshold lands in the measured gap). Screen margin: banded
    // candidates at Hamming <= 2, one step past the 2-band pigeonhole
    // losslessness radius (<= 1) — a deliberate best-effort band, the
    // d23 scope discipline, documented rather than hidden. Shape: ONE
    // patch kernel pass feeds sketch and verify (patchVectors); the
    // verify attaches are SHUFFLED joins with the corpus-vector side
    // as build — the screened pair set must never broadcast, because a
    // FIXED-width sketch saturates as the corpus grows (see the
    // in-body note; the one-decade check caught the old broadcast
    // build OOMing at sf1).
    Q("m11_image_dedup_verified",
      "production image dedup: banded pHash screen (Hamming <= 2) + exact centered-cosine verify >= 0.9",
      (s, d) => {
        import graft.functions.Portable.{centerFast, dotFast}
        // ONE kernel pass: the checkpointed patch-vector frame feeds
        // BOTH the sketch (via imageSketchesOf) and the verify's
        // centered vectors — without this, screen and verify each pay
        // the decode+grid scan (measured 2.64 s vs 1.9 s at sf0.1)
        val bb = phashBandBits(docCount(s, d))
        val pv = patchVectors(s, d).localCheckpoint(true)
        val screened = sketchPairsOf(imageSketchesOf(pv, bb), bb)
          .filter(col("hamming") <= 2)
          .select(col("doc_a"), col("doc_b"), col("hamming"))
        // centerFast keeps the centering ONE expression node — the
        // per-element spelling blew past the 64 KB codegen limit once
        // the norm and the join's null filter re-inlined it (O(d³))
        val cn = pv
          .select(col("doc_id"), centerFast(col("v")).as("cv"))
          .withColumn("cnrm", sqrt(dotFast(col("cv"), col("cv"))))
        val aSide = cn.select(col("doc_id").as("doc_a"),
          col("cv").as("ca"), col("cnrm").as("na"))
        val bSide = cn.select(col("doc_id").as("doc_b"),
          col("cv").as("cb"), col("cnrm").as("nb"))
        // SHUFFLED attaches with the corpus-vector side as build (the
        // d22/d23 size-attach discipline), never a pair-side broadcast:
        // a FIXED-width sketch saturates as the corpus grows — a 16-bit
        // sketch's 8-bit bands hold ≤256 values, so candidate pairs
        // scale ~n²/256 and stop being output-bound (the one-decade
        // check measured the old broadcast build failing at sf1 with a
        // driver OOM). phashBandBits now implements the production
        // lever — the sketch WIDENS with the corpus (the 64-bit/4-band
        // pHash discipline at crawl scale), keeping candidates
        // output-bound — but the attach build-side discipline stays:
        // screen output is still best-effort-bounded, not proven.
        screened.join(aSide.hint("shuffle_hash"), Seq("doc_a"))
          .join(bSide.hint("shuffle_hash"), Seq("doc_b"))
          .withColumn("cosine",
            dotFast(col("ca"), col("cb")) / (col("na") * col("nb")))
          .filter(col("cosine") >= 0.9)
          .select(col("doc_a"), col("doc_b"), col("hamming"), col("cosine"))
          .orderBy("doc_a", "doc_b")
      },
      Some(s"""$sqlPatchVectors,
             |$sqlPhashWidth,
             |c AS (SELECT doc_id, v, list_aggregate(v, 'sum') / 16.0 AS vbar FROM n),
             |cvt AS (SELECT doc_id, list_transform(v, x -> x - vbar) AS cv FROM c),
             |cn AS (SELECT doc_id, cv,
             |    sqrt(list_reduce(list_transform(range(1, 17), i -> cv[i] * cv[i]),
             |      (x, y) -> x + y)) AS cnrm
             |  FROM cvt),
             |sk AS (SELECT doc_id,
             |  list_reduce(list_transform(range(0, 2 * bb), j ->
             |    CASE WHEN list_reduce(list_transform(range(1, 17), i -> cv[i] *
             |        ((('0x' || substr(md5('hp_' || j || '_' || i), 1, 15))::BIGINT % 2001 - 1000) / 1000.0)),
             |        (x, y) -> x + y) >= 0.0
             |      THEN CAST(power(2, j) AS BIGINT) ELSE 0 END), (x, y) -> x + y) AS sig
             |FROM cn CROSS JOIN wp),
             |msk AS (SELECT bb, (1::BIGINT << bb) - 1 AS bmask FROM wp),
             |scr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |    bit_count(xor(a.sig, b.sig))::BIGINT AS hamming
             |  FROM sk a JOIN sk b ON a.doc_id < b.doc_id CROSS JOIN msk
             |  WHERE ((a.sig & bmask) = (b.sig & bmask)
             |      OR ((a.sig >> bb) & bmask) = ((b.sig >> bb) & bmask))
             |    AND bit_count(xor(a.sig, b.sig)) <= 2)
             |SELECT s.doc_a, s.doc_b, s.hamming,
             |  list_reduce(list_transform(range(1, 17), i -> x.cv[i] * y.cv[i]),
             |    (x2, y2) -> x2 + y2) / (x.cnrm * y.cnrm) AS cosine
             |FROM scr s JOIN cn x ON s.doc_a = x.doc_id
             |  JOIN cn y ON s.doc_b = y.doc_id
             |WHERE list_reduce(list_transform(range(1, 17), i -> x.cv[i] * y.cv[i]),
             |    (x2, y2) -> x2 + y2) / (x.cnrm * y.cnrm) >= 0.9
             |ORDER BY doc_a, doc_b""".stripMargin)),

    // Audio fingerprint matching — the Wang'03 (Shazam) landmark scheme
    // over m03's frame features: consecutive-frame shingles are the
    // landmarks, equal landmarks across tracks are candidate
    // correspondences, and a pair of tracks MATCHES when many
    // correspondences agree on one time offset (the offset-delta vote —
    // random collisions scatter across deltas; true containment piles
    // onto one). This is the audio twin of d08's positional span hashes:
    // content-derived keys plus POSITION, so the verdict localizes
    // (best_delta says WHERE track B sits inside track A). Landmark key
    // is the raw 6-value shingle tuple (portable string form), not an
    // engine hash, so both engines bucket identically with no collision
    // caveat. Hot landmarks (silence, synth boilerplate) are df-capped
    // at 50 docs — d07's policy — and singleton landmarks drop before
    // the join, so candidate pairs stay output-bound. Shape: the shingle
    // build is ONE doc-keyed window exchange riding the decode scan
    // (m10's shape); the df-cap join and pair self-join are both keyed
    // by landmark (the pair join reuses the cap join's exchange); the
    // vote is a map-side-collapsing (a, b, delta) count; at 100 TB no
    // stage touches more than the landmark stream and the true-match
    // pair set.
    Q("m12_audio_fingerprint",
      "Shazam-style landmark match: 3-frame shingle landmarks, offset-delta vote, best alignment per track pair (votes >= 3)",
      (s, d) => {
        val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
        val lm = audioFrames(mediaRecords(s, d)).toDF()
          .withColumn("e1", lead(col("energy"), 1).over(w))
          .withColumn("p1", lead(col("peak"), 1).over(w))
          .withColumn("e2", lead(col("energy"), 2).over(w))
          .withColumn("p2", lead(col("peak"), 2).over(w))
          .filter(col("e2").isNotNull)
          .select(col("doc_id"), col("frame_idx"),
            concat_ws("_", col("energy"), col("peak"), col("e1"),
              col("p1"), col("e2"), col("p2")).as("lkey"))
        val keep = lm.groupBy("lkey")
          .agg(countDistinct(col("doc_id")).as("ndocs"))
          .filter(col("ndocs") >= 2 && col("ndocs") <= 50)
          .select("lkey")
        // shuffle-hash, never broadcast: the surviving-landmark set is
        // corpus-scale at 100 TB (d07's df-cap policy); the pair
        // self-join is merge-hinted so both sides reuse the lkey
        // exchange the cap join already paid for
        val flt = lm.join(keep.hint("shuffle_hash"), Seq("lkey"))
        val a = flt.select(col("lkey").as("ka"),
          col("doc_id").as("doc_a"), col("frame_idx").as("fa"))
        val b = flt.select(col("lkey").as("kb"),
          col("doc_id").as("doc_b"), col("frame_idx").as("fb"))
        val wBest = Window.partitionBy(col("doc_a"), col("doc_b"))
          .orderBy(col("votes").desc, col("offset_delta").asc)
        a.hint("merge").join(b, col("ka") === col("kb") && col("doc_a") < col("doc_b"))
          .select(col("doc_a"), col("doc_b"),
            (col("fa") - col("fb")).as("offset_delta"))
          .groupBy("doc_a", "doc_b", "offset_delta")
          .agg(count(lit(1)).as("votes"))
          .withColumn("rn", row_number().over(wBest))
          .filter(col("rn") === 1 && col("votes") >= 3)
          .select(col("doc_a"), col("doc_b"), col("offset_delta"), col("votes"))
          .orderBy("doc_a", "doc_b")
      },
      Some("""WITH cps AS (SELECT doc_id,
             |    list_transform(range(1, length(text) + 1),
             |      i -> unicode(substr(text, i, 1))::BIGINT) AS cp
             |  FROM documents),
             |fr AS (SELECT doc_id, cp,
             |    unnest(range(0, CASE WHEN len(cp) < 64 THEN 0
             |                         ELSE (len(cp) - 64) // 32 + 1 END)) AS f
             |  FROM cps),
             |fa AS (SELECT doc_id, f::BIGINT AS frame_idx,
             |    list_aggregate(list_transform(range(f * 32 + 1, f * 32 + 65),
             |      i -> cp[i] * cp[i]), 'sum')::BIGINT AS energy,
             |    list_aggregate(list_transform(range(f * 32 + 1, f * 32 + 65),
             |      i -> cp[i]), 'max')::BIGINT AS peak
             |  FROM fr),
             |lm0 AS (SELECT doc_id, frame_idx,
             |    energy || '_' || peak || '_'
             |      || lead(energy, 1) OVER w || '_' || lead(peak, 1) OVER w || '_'
             |      || lead(energy, 2) OVER w || '_' || lead(peak, 2) OVER w AS lkey,
             |    lead(energy, 2) OVER w AS e2
             |  FROM fa WINDOW w AS (PARTITION BY doc_id ORDER BY frame_idx)),
             |lm AS (SELECT doc_id, frame_idx, lkey FROM lm0 WHERE e2 IS NOT NULL),
             |keep AS (SELECT lkey FROM (
             |    SELECT lkey, count(DISTINCT doc_id) AS ndocs FROM lm GROUP BY lkey)
             |  WHERE ndocs BETWEEN 2 AND 50),
             |flt AS (SELECT lm.* FROM lm JOIN keep USING (lkey)),
             |pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |    a.frame_idx - b.frame_idx AS offset_delta
             |  FROM flt a JOIN flt b ON a.lkey = b.lkey AND a.doc_id < b.doc_id),
             |v AS (SELECT doc_a, doc_b, offset_delta, count(*)::BIGINT AS votes
             |  FROM pr GROUP BY doc_a, doc_b, offset_delta),
             |r AS (SELECT *, row_number() OVER (PARTITION BY doc_a, doc_b
             |    ORDER BY votes DESC, offset_delta) AS rn FROM v)
             |SELECT doc_a, doc_b, offset_delta, votes FROM r
             |WHERE rn = 1 AND votes >= 3 ORDER BY doc_a, doc_b""".stripMargin)),

    // Keyframe selection — the step m10's header promises ("per-segment
    // sampling keeps one static shot from flooding a batch"): from each
    // scene segment pick ONE representative frame, the argmax-energy
    // frame with lowest-index tie-break (the classic keyframe rule —
    // highest-information frame per shot), plus the segment's extent
    // (first frame, frame count) so a downstream packer can weight or
    // re-sample shots by length. Training relevance: vision-language
    // batches sample k frames per VIDEO SEGMENT, not per video — without
    // the segment grain a 10-minute static shot contributes 100× the
    // frames of a 5-second cut at equal information. Shape: m10's frame
    // kernel and cut/segment windows, plus the per-(doc, segment)
    // argmax/extent windows — ALL of them cluster by doc_id subsets, so
    // the whole five-window stack rides m10's single doc-keyed exchange
    // (plan-asserted: one hash exchange total). At 100 TB this stays
    // the q41 single-exchange class; per-doc frame counts bound every
    // window buffer.
    Q("m13_keyframes",
      "per-scene keyframe: argmax-energy frame of each m10 segment + segment extent",
      (s, d) => {
        val fr = audioFrames(mediaRecords(s, d)).toDF()
        val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
        val wCum = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wSeg = Window.partitionBy(col("doc_id"), col("segment_id"))
          .orderBy(col("energy").desc, col("frame_idx").asc)
        val wSegAll = Window.partitionBy(col("doc_id"), col("segment_id"))
        fr.withColumn("prev_energy", lag(col("energy"), 1).over(w))
          .withColumn("delta",
            col("energy") - coalesce(col("prev_energy"), col("energy")))
          .withColumn("is_cut",
            abs(col("delta")) * lit(10L) > coalesce(col("prev_energy"), lit(0L)))
          .withColumn("segment_id",
            sum(when(col("is_cut"), 1L).otherwise(0L)).over(wCum))
          .withColumn("rn", row_number().over(wSeg))
          .withColumn("n_frames", count(lit(1)).over(wSegAll))
          .withColumn("seg_start", min(col("frame_idx")).over(wSegAll))
          .filter(col("rn") === 1)
          .select(col("doc_id"), col("segment_id"),
            col("frame_idx").as("keyframe_idx"),
            col("energy").as("keyframe_energy"),
            col("n_frames"), col("seg_start"))
          .orderBy("doc_id", "segment_id")
      },
      Some("""WITH cps AS (SELECT doc_id,
             |    list_transform(range(1, length(text) + 1),
             |      i -> unicode(substr(text, i, 1))::BIGINT) AS cp
             |  FROM documents),
             |fr AS (SELECT doc_id, cp,
             |    unnest(range(0, CASE WHEN len(cp) < 64 THEN 0
             |                         ELSE (len(cp) - 64) // 32 + 1 END)) AS f
             |  FROM cps),
             |en AS (SELECT doc_id, f::BIGINT AS frame_idx,
             |    list_aggregate(list_transform(range(f * 32 + 1, f * 32 + 65),
             |      i -> cp[i] * cp[i]), 'sum')::BIGINT AS energy
             |  FROM fr),
             |lg AS (SELECT doc_id, frame_idx, energy,
             |    lag(energy) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS prev_energy
             |  FROM en),
             |dl AS (SELECT doc_id, frame_idx, energy,
             |    abs(energy - coalesce(prev_energy, energy)) * 10 > coalesce(prev_energy, 0) AS is_cut
             |  FROM lg),
             |seg AS (SELECT doc_id, frame_idx, energy,
             |    (sum(CASE WHEN is_cut THEN 1 ELSE 0 END) OVER (PARTITION BY doc_id
             |      ORDER BY frame_idx ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT
             |      AS segment_id
             |  FROM dl),
             |r AS (SELECT doc_id, segment_id, frame_idx, energy,
             |    row_number() OVER (PARTITION BY doc_id, segment_id
             |      ORDER BY energy DESC, frame_idx) AS rn,
             |    count(*) OVER (PARTITION BY doc_id, segment_id)::BIGINT AS n_frames,
             |    min(frame_idx) OVER (PARTITION BY doc_id, segment_id)::BIGINT AS seg_start
             |  FROM seg)
             |SELECT doc_id, segment_id, frame_idx AS keyframe_idx,
             |  energy AS keyframe_energy, n_frames, seg_start
             |FROM r WHERE rn = 1 ORDER BY doc_id, segment_id""".stripMargin))
  )
}
