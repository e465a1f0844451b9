package graft.streaming

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class DocumentStreamsSpec extends SparkTestBase {

  private def ts(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2026-01-01 $hhmm:00")

  // >= 20 words, stopword-rich, low repetition — passes every t06 rule
  private val goodText =
    "the cat sat on a warm mat and it is a fine day in the sun to sit and think about many things"
  private val shortText = "too short to keep"

  test("curatedIngest: quality-drops, dedups across batches, keeps originals") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[DocumentStreams.Doc]
    val q = DocumentStreams.curatedIngest(in.toDS())
      .writeStream.format("memory").queryName("curated")
      .outputMode("append").start()
    try {
      in.addData(
        DocumentStreams.Doc(1L, ts("10:00"), goodText, "en", "src0"),
        DocumentStreams.Doc(2L, ts("10:01"), shortText, "en", "src0"),
        DocumentStreams.Doc(3L, ts("10:02"), goodText + " extra tail words here", "en", "src1"))
      q.processAllAvailable()
      // same normalized content as doc 1 (whitespace noise only — doubled
      // spaces and a tab collapse away), arriving in a LATER micro-batch —
      // must dedup against state. Guard against vacuity first: the dup
      // MUST pass the quality stage, else this test never reaches dedup.
      val dupText = goodText.replace(" ", "  ") + " \t"
      assert(DocumentStreams.scored(
        Seq(DocumentStreams.Doc(4L, ts("10:10"), dupText, "en", "src2")).toDS())
        .collect().head.keep,
        "duplicate probe must survive the quality stage to exercise dedup")
      in.addData(
        DocumentStreams.Doc(4L, ts("10:10"), dupText, "en", "src2"),
        DocumentStreams.Doc(5L, ts("10:11"), "fresh distinct text " + goodText, "en", "src0"))
      q.processAllAvailable()
      val kept = spark.table("curated").collect()
        .map(_.getAs[Long]("doc_id")).toSet
      assert(kept === Set(1L, 3L, 5L),
        "expected: quality-drop 2, duplicate-drop 4, keep first arrivals")
    } finally q.stop()
  }

  test("chunked: streamed chunk rows equal the t17 gate chunk-for-chunk (kernel vs Catalyst)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val d = "/root/testdata/sf0.001"
    val docs = graft.core.Tables.documents(spark, d)
      .select("doc_id", "text", "lang", "source").collect()
      .map(r => DocumentStreams.Doc(r.getLong(0), ts("09:00"),
        r.getString(1), r.getString(2), r.getString(3)))
    val (first, second) = docs.splitAt(docs.length / 2)
    val in = MemoryStream[DocumentStreams.Doc]
    val q = DocumentStreams.chunked(in.toDS())
      .writeStream.format("memory").queryName("chunks")
      .outputMode("append").start()
    try {
      in.addData(first.toSeq)
      q.processAllAvailable()
      in.addData(second.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    def key(r: org.apache.spark.sql.Row, off: Int) =
      (r.getLong(0), r.getLong(off), r.getLong(off + 1), r.getLong(off + 2),
        r.getString(off + 3))
    // the stream is a flatMap KERNEL, the gate is Catalyst sequence/
    // slice/concat_ws — equality pins the two formulations to the same
    // geometry and the same md5 input byte-for-byte
    val streamed = spark.table("chunks")
      .select("doc_id", "chunk_idx", "chunk_start", "n_chunk_tokens", "chunk_md5")
      .collect().map(key(_, 1)).sortBy(c => (c._1, c._2))
    val gate = graft.SparkEntry.queries("t17_chunking")(spark, d)
      .collect().map(key(_, 1)).sortBy(c => (c._1, c._2))
    assert(streamed.length === gate.length)
    assert(streamed === gate,
      "streamed chunks must equal the batch gate's chunk rows exactly")
  }

  test("streaming verdicts equal the batch t06 kernel on the documents table") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text", "lang", "source").collect()
      .map(r => DocumentStreams.Doc(r.getLong(0), ts("09:00"),
        r.getString(1), r.getString(2), r.getString(3)))
    // batch path: the same scoring map on a batch Dataset
    val batch = DocumentStreams.scored(docs.toSeq.toDS()).collect()
      .map(s => s.doc_id -> (s.keep, s.drop_reason, s.content_hash)).toMap
    // stream path
    val in = MemoryStream[DocumentStreams.Doc]
    val q = DocumentStreams.scored(in.toDS())
      .writeStream.format("memory").queryName("scored_stream")
      .outputMode("append").start()
    try {
      in.addData(docs.toSeq)
      q.processAllAvailable()
      val streamed = spark.table("scored_stream").as[DocumentStreams.Scored]
        .collect().map(s => s.doc_id -> (s.keep, s.drop_reason, s.content_hash))
        .toMap
      assert(streamed === batch)
      // and the verdicts are t06's (registry query on the same table)
      val t06 = graft.SparkEntry.queries("t06_quality_filter")(
        spark, "/root/testdata/sf0.001").collect()
        .map(r => r.getLong(0) -> r.getAs[Boolean]("keep")).toMap
      batch.foreach { case (id, (keep, _, _)) => assert(keep === t06(id)) }
    } finally q.stop()
  }

  test("nearDupStreamTTL: detects within horizon, forgets past it, state tracks the horizon") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // four mutual near-dups (tiny tail edits of the same long text) and
    // a herd of distinct fillers to populate—and then expire—state
    val base = goodText + " plus some more distinct trailing words to shingle on"
    def doc(id: Long, when: String, text: String) =
      DocumentStreams.Doc(id, ts(when), text, "en", "src")
    val in = MemoryStream[DocumentStreams.Doc]
    val q = DocumentStreams.nearDupStreamTTL(in.toDS(), horizonMinutes = 120)
      .writeStream.format("memory").queryName("neardup_ttl")
      .outputMode("append").start()
    def pairs() = spark.table("neardup_ttl")
      .as[DocumentStreams.NearDup].collect()
      .map(n => (n.dup_of, n.doc_id)).toSet
    def stateRows() = q.lastProgress.stateOperators
      .map(_.numRowsTotal).sum
    try {
      in.addData(doc(1L, "10:00", base + " one"))
      q.processAllAvailable()
      in.addData(doc(2L, "10:30", base + " two"))
      q.processAllAvailable()
      assert(pairs() === Set((1L, 2L)),
        "a near-dup arriving within the horizon must be detected")
      // OUT-OF-ORDER within-horizon detection — the guarantee that
      // forces the dropDuplicatesWithinWatermark retention rule
      // (ts + horizon > wm, NOT ts > wm): unrelated traffic at 12:20
      // advances the watermark to 10:20, then doc 5 arrives LATE with
      // ts 10:40 — admitted (above the watermark) and within the
      // horizon of docs 1 and 2, so both pairs must still emit even
      // though the watermark has moved past both stored entries
      in.addData(doc(800L, "12:20", "unrelated watermark driver " +
        (1 to 25).map(k => s"u$k").mkString(" ")))
      q.processAllAvailable()
      in.addData(doc(5L, "10:40", base + " five"))
      q.processAllAvailable()
      assert(pairs() === Set((1L, 2L), (1L, 5L), (2L, 5L)),
        "an out-of-order arrival within the horizon of stored docs must pair with them")
      // 50 pairwise-DISSIMILAR fillers at 15:00 drive the watermark to
      // 13:00 — past docs 1/2/5's (ingest + 2h) expiry — and fatten
      // state (every token is filler-unique, no two share a trigram)
      in.addData((100L to 149L).map(i =>
        doc(i, "15:00", (1 to 30).map(k => s"w${i}x$k").mkString(" "))))
      q.processAllAvailable()
      val peak = stateRows()
      // doc 3 is a near-dup of 1/2/5 but arrives after their horizon:
      // the documented recall trade — NOT detected (the batch d09/d14
      // over the sink owns cross-horizon pairs)
      in.addData(doc(3L, "15:30", base + " three"))
      q.processAllAvailable()
      assert(pairs() === Set((1L, 2L), (1L, 5L), (2L, 5L)),
        "state past the horizon must be forgotten (recall trade, by contract)")
      // doc 4 near-dups doc 3 WITHIN the horizon: still detected
      in.addData(doc(4L, "15:40", base + " four"))
      q.processAllAvailable()
      assert(pairs() === Set((1L, 2L), (1L, 5L), (2L, 5L), (3L, 4L)),
        "detection within the horizon must survive the TTL machinery")
      // two far-future batches advance the watermark past every filler's
      // expiry; their buckets time out and REMOVE state — total state
      // tracks the horizon's volume, not stream history
      in.addData(doc(900L, "22:00", "late window opener " + goodText))
      q.processAllAvailable()
      in.addData(doc(901L, "22:05", "late window closer " + goodText.reverse))
      q.processAllAvailable()
      val settled = stateRows()
      assert(settled < peak,
        s"expired buckets must leave state (peak=$peak settled=$settled)")
      assert(settled <= 40,
        s"state must hold only the last horizon's documents, got $settled")
    } finally q.stop()
  }

  test("signatureIngest: streamed store equals the batch signatures; replays are idempotent") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    implicit val sq = spark.sqlContext
    val d = "/root/testdata/sf0.001"
    val store = java.nio.file.Files
      .createTempDirectory("graft_sig_ingest").toString
    val docs = graft.core.Tables.documents(spark, d)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      .collect().sortBy(_.getLong(0))
      .map(r => DocumentStreams.Doc(r.getLong(0), ts("09:00"),
        r.getString(1), r.getString(2), r.getString(3)))
    val (first, second) = docs.splitAt(docs.length / 2)
    val in = MemoryStream[DocumentStreams.Doc]
    val q = DocumentStreams.signatureIngest(in.toDS(), store).start()
    try {
      in.addData(first.toSeq)
      q.processAllAvailable()
      in.addData(second.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    // the streamed store is bit-identical to the batch computation d15
    // would run over the same documents
    val stored = spark.read.parquet(store).drop("batch_id")
    val expected = graft.operators.Dedup.minhashSigsSized(
      graft.operators.Dedup.explodedShinglesOf(
        graft.core.Tables.documents(spark, d).select("doc_id", "text")))
    assert(stored.count() === expected.count())
    assert(stored.exceptAll(expected).isEmpty && expected.exceptAll(stored).isEmpty,
      "streamed signatures must equal the batch-computed signatures")
    // a failure-redelivered batch rewrites its own subdir, never appends:
    // replay the second micro-batch (id 1) and expect an unchanged store
    val before = spark.read.parquet(store).count()
    DocumentStreams.writeSignatureBatch(second.toSeq.toDS(), store, 1L)
    assert(spark.read.parquet(store).count() === before,
      "replaying a delivered batch id must be a no-op for the store")
  }

  test("sourceSigIngest: streamed store min-merges to the batch signatures; d21 overlap identical") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    implicit val sq = spark.sqlContext
    val d = "/root/testdata/sf0.001"
    val store = java.nio.file.Files
      .createTempDirectory("graft_srcsig_ingest").toString
    val docs = graft.core.Tables.documents(spark, d)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      .collect().sortBy(_.getLong(0))
      .map(r => DocumentStreams.Doc(r.getLong(0), ts("09:00"),
        r.getString(1), r.getString(2), r.getString(3)))
    // split mid-stream so most sources SPAN the batch boundary — the
    // min-merge, not per-batch luck, must recover the corpus signature
    val (first, second) = docs.splitAt(docs.length / 2)
    val in = MemoryStream[DocumentStreams.Doc]
    val q = DocumentStreams.sourceSigIngest(in.toDS(), store).start()
    try {
      in.addData(first.toSeq)
      q.processAllAvailable()
      in.addData(second.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val merged = graft.operators.Dedup.mergeSourceSigs(
      spark.read.parquet(store).drop("batch_id"))
    val expected = graft.operators.Dedup.sourceSignatures(
      graft.core.Tables.documents(spark, d).select("source", "text"))
    assert(merged.count() === expected.count())
    assert(merged.exceptAll(expected).isEmpty && expected.exceptAll(merged).isEmpty,
      "min-merged streamed signatures must equal the whole-corpus signatures")
    // min is idempotent: a duplicate batch subdir (NOT overwritten —
    // written under a fresh id, the worst redelivery case) merges to
    // the same signatures
    DocumentStreams.writeSourceSigBatch(second.toSeq.toDS(), store, 99L)
    val remerged = graft.operators.Dedup.mergeSourceSigs(
      spark.read.parquet(store).drop("batch_id"))
    assert(remerged.exceptAll(expected).isEmpty && expected.exceptAll(remerged).isEmpty,
      "a duplicated batch under a fresh id must not change the merged signatures")
    // and the overlap map over the merged store equals d21's gate answer
    val viaStore = graft.operators.Dedup.sourceOverlapOf(merged)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val viaGate = graft.SparkEntry.queries("d21_source_overlap")(spark, d)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(viaStore === viaGate,
      "the streamed sidecar must be drop-in for d21's inline derivation")
  }

  test("d15 consumes a signatureIngest-streamed store: producer and batch consumer agree") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    implicit val sq = spark.sqlContext
    val d = "/root/testdata/sf0.001"
    val store = java.nio.file.Files
      .createTempDirectory("graft_streamed_store").toString
    // stream ONLY the stored slice (what the warehouse held before
    // today's batch) through the production producer, two micro-batches
    val docs = graft.core.Tables.documents(spark, d)
      .filter(col("doc_id") % 5 =!= 4)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      .collect().sortBy(_.getLong(0))
      .map(r => DocumentStreams.Doc(r.getLong(0), ts("09:00"),
        r.getString(1), r.getString(2), r.getString(3)))
    val (first, second) = docs.splitAt(docs.length / 2)
    val in = MemoryStream[DocumentStreams.Doc]
    val q = DocumentStreams.signatureIngest(in.toDS(), store).start()
    try {
      in.addData(first.toSeq)
      q.processAllAvailable()
      in.addData(second.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    // the batch consumer reads the STREAMED store (batch_id partition
    // column and all) and must produce exactly the d15 gate's answer
    val viaStream = graft.operators.Dedup
      .incrementalNearDup(spark, d, store).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val viaGate = graft.SparkEntry.queries("d15_incremental_neardup")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viaStream === viaGate,
      "the streamed store must be drop-in for the batch-rebuilt store")
    // and the SAME streamed store feeds the d25 containment consumer —
    // the one-sidecar-two-consumers contract (d15 reads signatures,
    // d25 additionally reads nsh)
    val contStream = graft.operators.Dedup
      .incrementalContainment(spark, d, store).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6))).toSeq
    val contGate = graft.SparkEntry.queries("d25_incremental_containment")(
      spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6))).toSeq
    assert(contStream === contGate,
      "the streamed sized store must be drop-in for d25's batch-rebuilt store")
  }

  test("hashIngest: streamed store min-merges to the batch canonicals; replays are idempotent") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, min}
    implicit val sq = spark.sqlContext
    val d = "/root/testdata/sf0.001"
    val store = java.nio.file.Files
      .createTempDirectory("graft_hash_ingest").toString
    val docs = graft.core.Tables.documents(spark, d)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      .collect().sortBy(_.getLong(0))
      .map(r => DocumentStreams.Doc(r.getLong(0), ts("09:00"),
        r.getString(1), r.getString(2), r.getString(3)))
    val (first, second) = docs.splitAt(docs.length / 2)
    val in = MemoryStream[DocumentStreams.Doc]
    val q = DocumentStreams.hashIngest(in.toDS(), store).start()
    try {
      in.addData(first.toSeq)
      q.processAllAvailable()
      in.addData(second.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    // min-merged across the per-batch rows, the streamed store equals
    // the batch one-shot (content_hash, min doc_id) computation
    val stored = spark.read.parquet(store)
      .groupBy("content_hash")
      .agg(min(col("stored_canonical")).as("stored_canonical"))
    val expected = graft.operators.Dedup.contentHashes(
      graft.core.Tables.documents(spark, d).select("doc_id", "text"))
      .groupBy("content_hash")
      .agg(min(col("doc_id")).as("stored_canonical"))
    assert(stored.exceptAll(expected).isEmpty && expected.exceptAll(stored).isEmpty,
      "streamed store must min-merge to the batch-computed canonicals")
    // a failure-redelivered batch rewrites its own subdir, never appends
    val before = spark.read.parquet(store).count()
    DocumentStreams.writeHashBatch(second.toSeq.toDS(), store, 1L)
    assert(spark.read.parquet(store).count() === before,
      "replaying a delivered batch id must be a no-op for the store")
  }

  test("bloomIngest: streamed bit set unions to the batch bloom; replays are idempotent") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, explode}
    implicit val sq = spark.sqlContext
    val d = "/root/testdata/sf0.001"
    val store = java.nio.file.Files
      .createTempDirectory("graft_bloom_ingest").toString
    val docs = graft.core.Tables.documents(spark, d)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      .collect().sortBy(_.getLong(0))
      .map(r => DocumentStreams.Doc(r.getLong(0), ts("09:00"),
        r.getString(1), r.getString(2), r.getString(3)))
    val (first, second) = docs.splitAt(docs.length / 2)
    val in = MemoryStream[DocumentStreams.Doc]
    val q = DocumentStreams.bloomIngest(in.toDS(), store).start()
    try {
      in.addData(first.toSeq)
      q.processAllAvailable()
      in.addData(second.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    // the bloom is a monotone fold: the union of per-batch position
    // sets equals the positions of a one-shot batch build
    val streamed = spark.read.parquet(store)
      .select("bit_pos").distinct().collect().map(_.getLong(0)).toSet
    val expected = graft.operators.Dedup.contentHashes(
      graft.core.Tables.documents(spark, d).select("doc_id", "text"))
      .select(explode(graft.operators.Dedup.bloomPositions(
        col("content_hash"))).as("bit_pos"))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(streamed === expected,
      "streamed bit set must union to the batch-computed bloom")
    // a failure-redelivered batch rewrites its own subdir, never appends
    val before = spark.read.parquet(store).count()
    DocumentStreams.writeBloomBatch(second.toSeq.toDS(), store, 1L)
    assert(spark.read.parquet(store).count() === before,
      "replaying a delivered batch id must be a no-op for the store")
  }

  test("d18 consumes bloomIngest-streamed sidecars: producer and batch consumer agree") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    implicit val sq = spark.sqlContext
    val d = "/root/testdata/sf0.001"
    val bloom = java.nio.file.Files
      .createTempDirectory("graft_streamed_bloom").toString
    val hashes = java.nio.file.Files
      .createTempDirectory("graft_streamed_bloomhash").toString
    // stream ONLY the stored slice through BOTH production producers
    // (the bloom sidecar and the hash store it prefilters), two
    // micro-batches each
    val docs = graft.core.Tables.documents(spark, d)
      .filter(col("doc_id") % 5 =!= 4)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      .collect().sortBy(_.getLong(0))
      .map(r => DocumentStreams.Doc(r.getLong(0), ts("09:00"),
        r.getString(1), r.getString(2), r.getString(3)))
    val (first, second) = docs.splitAt(docs.length / 2)
    val in = MemoryStream[DocumentStreams.Doc]
    val qb = DocumentStreams.bloomIngest(in.toDS(), bloom).start()
    val qh = DocumentStreams.hashIngest(in.toDS(), hashes).start()
    try {
      in.addData(first.toSeq)
      qb.processAllAvailable(); qh.processAllAvailable()
      in.addData(second.toSeq)
      qb.processAllAvailable(); qh.processAllAvailable()
    } finally { qb.stop(); qh.stop() }
    // the batch consumer reads the STREAMED sidecars (one subdir per
    // micro-batch, distinct'd/deduped at read) and must produce exactly
    // the d18 gate's oracle-checked verdicts
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getBoolean(2), r.getBoolean(3),
        r.getBoolean(4))).toSeq
    val batch = graft.core.Tables.documents(spark, d)
      .filter(col("doc_id") % 5 === 4).select("doc_id", "text")
    val viaStream = rows(
      graft.operators.Dedup.bloomPrefilterOf(batch, bloom, hashes))
    val viaGate = rows(
      graft.SparkEntry.queries("d18_bloom_prefilter")(spark, d))
    assert(viaStream === viaGate,
      "the streamed sidecars must be drop-in for the batch-rebuilt ones")
  }

  test("t19 consumes an lmIngest-streamed count sidecar: per-batch counts sum to the one-shot LM") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    implicit val sq = spark.sqlContext
    val d = "/root/testdata/sf0.001"
    val store = java.nio.file.Files
      .createTempDirectory("graft_streamed_lm").toString
    // stream ONLY the stored slice (the LM's training side), two
    // micro-batches — the per-batch count tables must SUM to the
    // one-shot LM so the consumer's verdicts equal the gate's
    val docs = graft.core.Tables.documents(spark, d)
      .filter(col("doc_id") % 5 =!= 4)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      .collect().sortBy(_.getLong(0))
      .map(r => DocumentStreams.Doc(r.getLong(0), ts("09:00"),
        r.getString(1), r.getString(2), r.getString(3)))
    val (first, second) = docs.splitAt(docs.length / 2)
    val in = MemoryStream[DocumentStreams.Doc]
    val q = DocumentStreams.lmIngest(in.toDS(), store).start()
    try {
      in.addData(first.toSeq)
      q.processAllAvailable()
      in.addData(second.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toSeq
    val batch = graft.core.Tables.documents(spark, d)
      .filter(col("doc_id") % 5 === 4).select("doc_id", "text")
    val viaStream = rows(
      graft.operators.TextAnalysis.familiarityOf(batch, store))
    val viaGate = rows(
      graft.SparkEntry.queries("t19_incremental_familiarity")(spark, d))
    assert(viaStream === viaGate,
      "the streamed count sidecar must be drop-in for the one-shot LM store")
    // a failure-redelivered batch rewrites its own subdir, never
    // double-counts
    val before = rows(
      graft.operators.TextAnalysis.familiarityOf(batch, store))
    DocumentStreams.writeLmBatch(second.toSeq.toDS(), store, 1L)
    assert(rows(graft.operators.TextAnalysis.familiarityOf(batch, store))
      === before,
      "replaying a delivered batch id must not change any count")
  }

  test("clfIngest-streamed count sidecar folds to the exact t33 weight table; redelivery is idempotent") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    implicit val sq = spark.sqlContext
    val d = "/root/testdata/sf0.001"
    val store = java.nio.file.Files
      .createTempDirectory("graft_streamed_clf").toString
    // stream ONLY the pinned train window (t33's labeled sample), two
    // micro-batches — per-batch (tok, cp, cn) counts must SUM to the
    // inline trainer's statistics
    val docs = graft.core.Tables.documents(spark, d)
      .filter(col("doc_id") % 5 === 4 && col("doc_id") < 2000)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      .collect().sortBy(_.getLong(0))
      .map(r => DocumentStreams.Doc(r.getLong(0), ts("09:00"),
        r.getString(1), r.getString(2), r.getString(3)))
    val (first, second) = docs.splitAt(docs.length / 2)
    val in = MemoryStream[DocumentStreams.Doc]
    val q = DocumentStreams.clfIngest(in.toDS(), store).start()
    try {
      in.addData(first.toSeq)
      q.processAllAvailable()
      in.addData(second.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    def wRows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    val inline = graft.operators.TextAnalysis.clfModelOf(
      graft.operators.TextAnalysis.clfLabeled(
        graft.core.Tables.documents(spark, d).select("doc_id", "text"))
        .filter(col("doc_id") % 5 === 4 && col("doc_id") < 2000))._1
    val streamed = graft.operators.TextAnalysis
      .clfWeightsFromStore(spark, store)
    assert(wRows(streamed) === wRows(inline),
      "folded sidecar counts must derive the inline trainer's exact weights")
    // a failure-redelivered batch rewrites its own subdir, never
    // double-counts
    DocumentStreams.writeClfBatch(second.toSeq.toDS(), store, 1L)
    assert(wRows(graft.operators.TextAnalysis
      .clfWeightsFromStore(spark, store)) === wRows(inline),
      "replaying a delivered batch id must not change any weight")
  }

  test("t27 consumes a cardIngest-streamed sidecar: per-batch cell counts sum to the one-shot card") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    implicit val sq = spark.sqlContext
    val d = "/root/testdata/sf0.001"
    val store = java.nio.file.Files
      .createTempDirectory("graft_streamed_card").toString
    // stream ONLY the stored half (t27's md5-derived drift split — NOT
    // the gates' doc_id%5; see driftBatchCol), two micro-batches
    val docs = graft.core.Tables.documents(spark, d)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      .collect().sortBy(_.getLong(0))
      .map(r => DocumentStreams.Doc(r.getLong(0), ts("09:00"),
        r.getString(1), r.getString(2), r.getString(3)))
      .filter(doc =>
        graft.functions.Portable.h60Scala(s"drift_${doc.doc_id}") % 5 != 4)
    val (first, second) = docs.splitAt(docs.length / 2)
    val in = MemoryStream[DocumentStreams.Doc]
    val q = DocumentStreams.cardIngest(in.toDS(), store).start()
    try {
      in.addData(first.toSeq)
      q.processAllAvailable()
      in.addData(second.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getString(6))).toSeq
    val batchDocs = graft.core.Tables.documents(spark, d)
      .filter(graft.functions.Portable.h60(
        org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit("drift_"),
          col("doc_id").cast("string"))) % 5 === 4)
    val viaStream = rows(
      graft.operators.TextAnalysis.driftOf(batchDocs, store))
    val viaGate = rows(
      graft.SparkEntry.queries("t27_mixture_drift")(spark, d))
    assert(viaStream === viaGate,
      "the streamed card sidecar must be drop-in for the one-shot store")
    // a failure-redelivered batch rewrites its own subdir, never
    // double-counts
    DocumentStreams.writeCardBatch(second.toSeq.toDS(), store, 1L)
    assert(rows(graft.operators.TextAnalysis.driftOf(batchDocs, store))
      === viaStream,
      "replaying a delivered batch id must not change any cell count")
  }

  test("t32 consumes a postingsIngest-streamed index: segment union equals the one-shot store") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    implicit val sq = spark.sqlContext
    val d = "/root/testdata/sf0.001"
    val store = java.nio.file.Files
      .createTempDirectory("graft_streamed_postings").toString
    // stream the WHOLE corpus in two micro-batches (a different split
    // than the gate fixture's doc_id % 2 — the consumer depends only on
    // the UNION of segments, which is the point)
    val docs = graft.core.Tables.documents(spark, d)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      .collect().sortBy(_.getLong(0))
      .map(r => DocumentStreams.Doc(r.getLong(0), ts("09:00"),
        r.getString(1), r.getString(2), r.getString(3)))
    val (first, second) = docs.splitAt(docs.length / 2)
    val in = MemoryStream[DocumentStreams.Doc]
    val q = DocumentStreams.postingsIngest(in.toDS(), store).start()
    try {
      in.addData(first.toSeq)
      q.processAllAvailable()
      in.addData(second.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    val viaStream = rows(
      graft.operators.TextAnalysis.bm25StoreTopK(spark, store))
    val viaGate = rows(
      graft.SparkEntry.queries("t32_bm25_store_topk")(spark, d))
    assert(viaStream === viaGate,
      "the streamed segment store must be drop-in for the gate's two-batch fixture")
    // a failure-redelivered segment rewrites its own subdir: postings
    // never double-count, scores never move
    DocumentStreams.writePostingsBatch(second.toSeq.toDS(), store, 1L)
    assert(rows(graft.operators.TextAnalysis.bm25StoreTopK(spark, store))
      === viaStream,
      "replaying a delivered batch id must not change any score")
  }

  test("d16 consumes a hashIngest-streamed store: producer and batch consumer agree") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    implicit val sq = spark.sqlContext
    val d = "/root/testdata/sf0.001"
    val store = java.nio.file.Files
      .createTempDirectory("graft_streamed_hashstore").toString
    // stream ONLY the stored slice (what the warehouse held before
    // today's batch) through the production producer, two micro-batches
    val docs = graft.core.Tables.documents(spark, d)
      .filter(col("doc_id") % 5 =!= 4)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      .collect().sortBy(_.getLong(0))
      .map(r => DocumentStreams.Doc(r.getLong(0), ts("09:00"),
        r.getString(1), r.getString(2), r.getString(3)))
    val (first, second) = docs.splitAt(docs.length / 2)
    val in = MemoryStream[DocumentStreams.Doc]
    val q = DocumentStreams.hashIngest(in.toDS(), store).start()
    try {
      in.addData(first.toSeq)
      q.processAllAvailable()
      in.addData(second.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    // the batch consumer reads the STREAMED store (one subdir per
    // micro-batch, min-merged at read) and must produce exactly the
    // d16 gate's oracle-checked answer
    val viaStream = graft.operators.Dedup
      .incrementalExact(spark, d, store).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getBoolean(3))).toSeq
    val viaGate = graft.SparkEntry.queries("d16_incremental_exact")(spark, d)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getBoolean(3))).toSeq
    assert(viaStream === viaGate,
      "the streamed store must be drop-in for the batch-rebuilt store")
  }

  test("d33 consumes a frontierIngest-streamed store: producer and batch consumer agree; re-sent canons are harmless") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    implicit val sq = spark.sqlContext
    val d = "/root/testdata/sf0.001"
    val store = java.nio.file.Files
      .createTempDirectory("graft_streamed_urlstore").toString
    // stream the even-doc_id half (what the frontier held before
    // today's crawl round): corpus evens plus the URL fixture's evens,
    // through the production producer, two micro-batches
    val fix = spark.read.option("sep", "\t").option("header", "true")
      .schema("doc_id LONG, text STRING")
      .csv("/root/repo/fixtures/url_docs.tsv")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("fix"))
    val docs = graft.core.Tables.documents(spark, d)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      .unionByName(fix.select("doc_id", "text", "lang", "source"))
      .filter(col("doc_id") % 2 === 0)
      .collect().sortBy(_.getLong(0))
      .map(r => DocumentStreams.Doc(r.getLong(0), ts("09:00"),
        r.getString(1), r.getString(2), r.getString(3)))
    val (first, second) = docs.splitAt(docs.length / 2)
    val in = MemoryStream[DocumentStreams.Doc]
    val q = DocumentStreams.frontierIngest(in.toDS(), store).start()
    try {
      in.addData(first.toSeq)
      q.processAllAvailable()
      in.addData(second.toSeq)
      q.processAllAvailable()
      // an at-least-once upstream re-sends the second batch's docs under
      // a NEW batch id: a third subdir with already-seen canons — the
      // set-semantics probe must be unaffected
      in.addData(second.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getBoolean(3))).toSeq
    val viaStream = rows(graft.operators.Dedup.urlFrontier(spark, d, store))
    val viaGate = rows(
      graft.SparkEntry.queries("d33_url_frontier")(spark, d))
    assert(viaStream === viaGate,
      "the streamed frontier must be drop-in for the batch-rebuilt store")
    assert(viaGate.exists(_._4) && viaGate.exists(!_._4),
      "the fixture must exercise both is_new polarities")
  }

  test("nearDupStream finds exactly d14's estimated pairs across batch boundaries") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    implicit val sq = spark.sqlContext
    val d = "/root/testdata/sf0.001"
    // batch answer: banded candidates kept at >= 15/30 signature agreement
    val batch = graft.SparkEntry.queries("d14_minhash_estimate")(spark, d)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

    // feed in doc_id order split across two batches, so later-id docs
    // find earlier-id ones in bucket state — both within one batch and
    // across the boundary — and dup_of is always the lower id
    val docs = graft.core.Tables.documents(spark, d)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      .collect().sortBy(_.getLong(0))
      .map(r => DocumentStreams.Doc(r.getLong(0), ts("09:00"),
        r.getString(1), r.getString(2), r.getString(3)))
    val (first, second) = docs.splitAt(docs.length / 2)
    val in = MemoryStream[DocumentStreams.Doc]
    val q = DocumentStreams.nearDupStream(in.toDS())
      .writeStream.format("memory").queryName("neardup_stream")
      .outputMode("append").start()
    try {
      in.addData(first.toSeq)
      q.processAllAvailable()
      val afterFirst = spark.table("neardup_stream").count()
      in.addData(second.toSeq)
      q.processAllAvailable()
      val streamed = spark.table("neardup_stream")
        .as[DocumentStreams.NearDup].collect()
        .map(n => (n.dup_of, n.doc_id) -> n.est_matches).toMap
      assert(streamed === batch,
        "streamed near-dup pairs and estimates must equal the batch d14 answer")
      assert(afterFirst > 0 && afterFirst < streamed.size,
        "the split must exercise both in-batch and cross-batch detection")
    } finally q.stop()
  }

  test("containmentStream equals the batch d23 answer on shuffled replay across batch boundaries") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    implicit val sq = spark.sqlContext
    val d = "/root/testdata/sf0.001"
    // batch answer: banded candidates with either-direction estimated
    // containment >= 0.85 — full row tuples, doubles compared EXACTLY
    // (the stream mirrors the batch float expressions op-for-op)
    val batch = graft.SparkEntry.queries("d23_containment_estimate")(spark, d)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5),
          r.getDouble(6))).toMap
    assert(batch.nonEmpty, "fixture must plant qualifying containments")

    // SHUFFLED replay: arrival order must not matter — the stream
    // normalizes each emitted pair to (min id, max id) like the batch
    val docs = graft.core.Tables.documents(spark, d)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      .collect()
      .map(r => DocumentStreams.Doc(r.getLong(0), ts("09:00"),
        r.getString(1), r.getString(2), r.getString(3)))
    val shuffled = new scala.util.Random(42L).shuffle(docs.toSeq)
    val (first, second) = shuffled.splitAt(shuffled.length / 2)
    val in = MemoryStream[DocumentStreams.Doc]
    val q = DocumentStreams.containmentStream(in.toDS())
      .writeStream.format("memory").queryName("containment_stream")
      .outputMode("append").start()
    try {
      in.addData(first)
      q.processAllAvailable()
      in.addData(second)
      q.processAllAvailable()
      val streamed = spark.table("containment_stream")
        .as[DocumentStreams.ContainmentEst].collect()
        .map(c => (c.doc_a, c.doc_b) ->
          (c.size_a, c.size_b, c.est_matches, c.est_c_a_in_b,
            c.est_c_b_in_a)).toMap
      assert(streamed === batch,
        "streamed containment screen must equal the batch d23 answer")
    } finally q.stop()
  }

  test("containmentStreamTTL: screens within horizon, forgets past it") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val base = goodText + " plus some more distinct trailing words to shingle on"
    def doc(id: Long, when: String, text: String) =
      DocumentStreams.Doc(id, ts(when), text, "en", "src")
    val in = MemoryStream[DocumentStreams.Doc]
    val q = DocumentStreams.containmentStreamTTL(in.toDS(), horizonMinutes = 120)
      .writeStream.format("memory").queryName("containment_ttl")
      .outputMode("append").start()
    def pairs() = spark.table("containment_ttl")
      .as[DocumentStreams.ContainmentEst].collect()
      .map(c => (c.doc_a, c.doc_b)).toSet
    try {
      // 2 is 1 plus a short tail: 1's shingles are a subset, so the
      // containment screen must flag the pair (J is high because the
      // sizes are competitive — the operator's documented sweet spot)
      in.addData(doc(1L, "10:00", base),
        doc(2L, "10:05", base + " tiny tail appended"))
      q.processAllAvailable()
      assert(pairs() === Set((1L, 2L)), "within-horizon pair must screen")
      // distinct far-future filler advances the watermark ~8h: every
      // stored entry ages past ingest + horizon
      in.addData(doc(99L, "20:00",
        "completely different filler content with enough words to build " +
          "its own shingles and advance the event time frontier far ahead"))
      q.processAllAvailable()
      // 3 replays 1's text after expiry: the old pair partners are
      // forgotten (documented recall trade — the batch d22/d23 over the
      // sink owns cross-horizon pairs); 4 within 3's horizon screens
      in.addData(doc(3L, "20:05", base),
        doc(4L, "20:06", base + " tiny tail appended"))
      q.processAllAvailable()
      assert(pairs() === Set((1L, 2L), (3L, 4L)),
        "expired partners must not screen; fresh within-horizon pair must")
    } finally q.stop()
  }
}
