package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkTestBase

/** NULL text rides every typed kernel path as the EMPTY document (the
  * Kernels.lowerTokens contract). The synthetic tables carry no nulls,
  * but a real crawl's do — and a kernel NPE inside mapPartitions fails
  * the whole task, so this is the difference between "drops one junk
  * row" and "daily batch crashes". Column-expression queries already
  * null-propagate identically in both engines; these specs pin the
  * typed (mapPartitions) paths to the same tolerance.
  */
class NullTextSpec extends SparkTestBase {

  private def frame(rows: (Long, String)*) = {
    val schema = StructType(Seq(StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2))), schema)
  }

  private val mixed = frame(
    (1L, null),
    (2L, "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima mike"),
    (3L, ""))

  test("shingle/window/signature kernels treat null text as an empty document") {
    val ex = Dedup.explodedShinglesOf(mixed)
    assert(ex.filter(org.apache.spark.sql.functions.col("doc_id").isin(1L, 3L))
      .count() === 0, "null/empty docs must contribute no shingles")
    assert(ex.filter(org.apache.spark.sql.functions.col("doc_id") === 2L)
      .count() === 11, "the real doc's trigrams must be unaffected")
    val win = Dedup.positionalWindowsOf(mixed, 12)
    assert(win.filter(org.apache.spark.sql.functions.col("doc_id") === 1L)
      .count() === 0)
    assert(win.count() === 2, "13 tokens -> two 12-token windows")
  }

  test("quality, repetition and hash paths give null docs the empty-doc verdict") {
    val f = TextAnalysis.qualityFilterOf(1L, null)
    assert(f.n_words === 0L && !f.keep,
      "a null doc must fail the min-words rule, not crash")
    // the d01/d16 key: md5 of null normalizes like SQL (null key), and
    // the batch-store producer path survives a null-bearing batch
    val hashed = Dedup.contentHashes(mixed).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toMap
    assert(hashed(1L).isEmpty, "null text must hash to a null key, as in SQL")
    assert(hashed(2L).nonEmpty)
  }

  test("multimodal decode treats null text as an empty payload") {
    import spark.implicits._
    val recs = Multimodal.mediaRecords(spark, "/root/testdata/sf0.001")
    // the real table has no nulls; drive the typed stages directly
    val ds = mixed.as[(Long, String)]
      .map { case (id, t) => Multimodal.MediaRecord(id,
        (if (t == null) "" else t).getBytes("UTF-8"), "media/test") }
    val metas = Multimodal.decode(ds).collect().map(m => m.doc_id -> m).toMap
    assert(metas(1L).n_bytes === 0L && metas(1L).cp_sum16 === 0L)
    assert(recs.count() > 0) // and the real path still reads
  }

  test("chunking emits zero chunks for null/empty docs in BOTH formulations") {
    import org.apache.spark.sql.functions.col
    // Catalyst gate form: size(tokens(null)) = -1 would slip past the
    // n === 0 guard and emit a phantom chunk without the coalesce
    val cat = TextAnalysis.chunksOf(mixed).collect()
    assert(!cat.exists(r => r.getLong(0) == 1L || r.getLong(0) == 3L),
      "null/empty docs must emit no chunks from the Catalyst form")
    assert(cat.count(_.getLong(0) == 2L) === 1,
      "the 13-token doc is one chunk")
    // streaming kernel form agrees
    import spark.implicits._
    val streamed = graft.streaming.DocumentStreams.chunked(
      mixed.collect().map(r => graft.streaming.DocumentStreams.Doc(
        r.getLong(0), java.sql.Timestamp.valueOf("2026-01-01 09:00:00"),
        r.getString(1), "en", "s")).toSeq.toDS()).collect()
    assert(streamed.map(c => (c.doc_id, c.chunk_idx, c.chunk_start,
      c.n_chunk_tokens, c.chunk_md5)).sorted.toSeq ===
      cat.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).sorted.toSeq,
      "kernel and Catalyst chunkers must agree on null-bearing frames")
    // and the t18 bigram kernel emits zero occurrences for null/empty
    // docs on the SAME null-bearing frame — deleting spaceTokens' null
    // guard NPEs this, not just a synthetic-data path
    val bg = TextAnalysis.bigramOcc(mixed).collect()
    assert(!bg.exists(r => r.getLong(0) == 1L || r.getLong(0) == 3L),
      "null/empty docs must contribute no bigram occurrences")
    assert(bg.count(_.getLong(0) == 2L) === 12, "13 tokens -> 12 bigrams")
  }
}
