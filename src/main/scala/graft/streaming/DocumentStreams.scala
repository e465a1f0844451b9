package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset

import graft.functions.Kernels
import graft.functions.Portable.md5HexScala
import graft.operators.TextAnalysis

/** Structured Streaming twins of the training-data pipeline's
  * per-document stages — the shape of a CONTINUOUS curation frontier
  * (crawl output arriving as a stream) rather than a periodic batch
  * re-scan.
  *
  * One code path serves both modes: the streaming map runs the SAME
  * typed kernels the batch queries use (t06's [[TextAnalysis.qualityFilterOf]],
  * d01's normalized-content hash via [[Kernels.lowerTokens]]), so a
  * document gets the identical verdict whether it arrives in a stream
  * micro-batch or a batch scan — asserted by the batch≡stream spec.
  *
  * Scale notes: the quality stage is stateless (a per-row map — no
  * shuffle, no watermark, runs at source rate on any executor count);
  * the dedup stage keeps only content hashes younger than the watermark,
  * so state tracks the crawl-overlap/redelivery horizon, not stream
  * history — the property that lets the query run forever. Corpus-wide
  * dedup beyond the horizon stays a batch job (d01/d09) over the sink,
  * exactly how production pipelines layer the two.
  */
object DocumentStreams {

  /** One arriving document; `ingest_ts` is the stream's event time. */
  final case class Doc(doc_id: Long, ingest_ts: Timestamp, text: String,
      lang: String, source: String)

  /** A quality-scored document: the t06 verdict fields plus the d01
    * normalized-content hash — the FULL 128-bit md5 hex, identical to
    * the batch d01 key, so stream and batch classify exactly the same
    * pairs as duplicates (a truncated hash would silently drop distinct
    * documents on collision at crawl scale).
    */
  final case class Scored(doc_id: Long, ingest_ts: Timestamp, lang: String,
      source: String, n_words: Long, keep: Boolean,
      drop_reason: Option[String], content_hash: String)

  /** Stateless per-document scoring — usable on a stream OR a batch
    * frame (the spec runs it on both and asserts equality).
    */
  def scored(docs: Dataset[Doc]): Dataset[Scored] = {
    import docs.sparkSession.implicits._
    docs.map { d =>
      val f = TextAnalysis.qualityFilterOf(d.doc_id, d.text)
      val norm = Kernels.lowerTokens(d.text).mkString(" ")
      Scored(d.doc_id, d.ingest_ts, d.lang, d.source, f.n_words, f.keep,
        f.drop_reason, md5HexScala(norm))
    }
  }

  /** Continuous curation: quality-filter each arriving document, then
    * drop exact duplicates (same normalized content) within the
    * watermark horizon — first arrival wins, redeliveries and
    * crawl-overlap copies are absorbed. Streaming twin of t06 → d01.
    */
  def curatedIngest(docs: Dataset[Doc],
      watermark: String = "2 hours"): Dataset[Scored] =
    scored(docs)
      .filter(_.keep)
      .withWatermark("ingest_ts", watermark)
      .dropDuplicatesWithinWatermark("content_hash")
}
