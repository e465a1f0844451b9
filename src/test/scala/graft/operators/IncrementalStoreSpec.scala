package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.streaming.DocumentStreams

/** Multi-batch evolution of the incremental warehouse stores — the
  * round-7 gates built their store once and consumed it once; these
  * specs drive the PRODUCTION loop: batch N dedups against the store,
  * appends its own rows, batch N+1 dedups against the grown store.
  * Appends go through the real producers' batch writers
  * ([[DocumentStreams.writeSignatureBatch]]/[[DocumentStreams.writeHashBatch]]
  * — what the streaming foreachBatch sinks call), so the store the
  * consumers read is byte-wise what an ingest pipeline leaves behind.
  *
  * The load-bearing assertions:
  *  - **Composition**: a store grown by successive batch appends gives
  *    the day-N batch EXACTLY the answer of the gate's one-shot store —
  *    for d15 that extends the gate's DuckDB oracle to the two-batch
  *    composition by transitivity (the gate output is hash-checked
  *    against the oracle every round).
  *  - **Canonical stability**: with arrival-ordered ids (later batches
  *    carry higher doc_ids — the production invariant), re-running an
  *    old batch against a store that has since grown returns its
  *    original canonicals unchanged: new arrivals can never steal a
  *    min-id canonical from the past.
  *  - **Self-inclusion**: a store already containing the batch's OWN
  *    rows (an ingest that ran ahead of the dedup pass) leaves the
  *    verdict unchanged — the producer-overlap guard in
  *    [[Dedup.incrementalNearDupOf]] (signatures would otherwise
  *    duplicate into the pair estimates) and the min-merge in
  *    [[Dedup.incrementalExactOf]].
  */
class IncrementalStoreSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def ts: Timestamp = Timestamp.valueOf("2026-01-01 09:00:00")

  private def docFrame(pred: org.apache.spark.sql.Column): DataFrame =
    graft.core.Tables.documents(spark, sf).filter(pred)
      .select("doc_id", "text")

  private def asDocs(df: DataFrame) = {
    import spark.implicits._
    df.select(col("doc_id"), col("text")).collect().toSeq
      .map(r => DocumentStreams.Doc(r.getLong(0), ts, r.getString(1), "en", "crawl"))
      .toDS()
  }

  private def pairs(df: DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def canon(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => (r.getLong(0), r.getLong(2))).toMap

  test("d15: a store grown batch-by-batch composes to the gate's oracle-checked answer") {
    val store = tmpDir() + "/sigstore"
    // day 0: the warehouse holds slices {0,1,2}; day 1 ingests slice 3
    DocumentStreams.writeSignatureBatch(
      asDocs(docFrame(col("doc_id") % 5 < 3)), store, 0L)
    val dayA = docFrame(col("doc_id") % 5 === 3)
    val resA = pairs(Dedup.incrementalNearDupOf(dayA, store))
    DocumentStreams.writeSignatureBatch(asDocs(dayA), store, 1L)
    // day 2 (the gate's batch, slice 4) against the twice-grown store:
    // the store now holds exactly the gate's stored slice (%5 != 4), so
    // the answer must equal the gate's — the oracle-checked output
    val dayB = docFrame(col("doc_id") % 5 === 4)
    val resB = pairs(Dedup.incrementalNearDupOf(dayB, store))
    val gate = pairs(
      graft.SparkEntry.queries("d15_incremental_neardup")(spark, sf))
    assert(resB === gate,
      "batch-by-batch store growth must compose to the one-shot gate answer")
    // day 1's verdicts are reproducible from its own store state: the
    // pairs it found all touch day-1 docs and pre-day-1 store content
    assert(resA.forall { case (a, b, _) =>
      (a % 5 == 3 || b % 5 == 3) && a % 5 < 4 && b % 5 < 4 })
  }

  test("d15: a store already holding the batch's own signatures leaves verdicts unchanged") {
    val store = tmpDir() + "/sigstore_overlap"
    DocumentStreams.writeSignatureBatch(
      asDocs(docFrame(col("doc_id") % 5 =!= 4)), store, 0L)
    val batch = docFrame(col("doc_id") % 5 === 4)
    val clean = pairs(Dedup.incrementalNearDupOf(batch, store))
    // an ingest that ran ahead: the batch's own signatures land in the
    // store BEFORE the dedup pass reads it
    DocumentStreams.writeSignatureBatch(asDocs(batch), store, 1L)
    val overlapped = Dedup.incrementalNearDupOf(batch, store)
    assert(pairs(overlapped) === clean,
      "store/batch doc_id overlap must not duplicate or alter pair estimates")
    // and emphatically no duplicate ROWS per pair (the pre-guard bug:
    // duplicated signatures multiplied through the estimate attach)
    val rows = overlapped.collect()
    assert(rows.length === rows.map(r => (r.getLong(0), r.getLong(1))).distinct.length,
      "each candidate pair must emit exactly one estimate row")
  }

  test("d16: growing hash store composes, and arrival-ordered canonicals never change") {
    val store = tmpDir() + "/hashstore"
    // arrival-ordered thirds by doc_id: later batches ⇒ higher ids (the
    // production id discipline that makes min-id canonicals monotone)
    val ids = graft.core.Tables.documents(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val (c1, c2) = (ids(ids.length / 3), ids(2 * ids.length / 3))
    DocumentStreams.writeHashBatch(
      asDocs(docFrame(col("doc_id") < c1)), store, 0L)
    val dayA = docFrame(col("doc_id") >= c1 && col("doc_id") < c2)
    val canonA = canon(Dedup.incrementalExactOf(dayA, store))
    DocumentStreams.writeHashBatch(asDocs(dayA), store, 1L)
    val dayB = docFrame(col("doc_id") >= c2)
    val canonB = canon(Dedup.incrementalExactOf(dayB, store))
    DocumentStreams.writeHashBatch(asDocs(dayB), store, 2L)
    // composition: every canonical is the true min id over everything
    // seen up to that batch (recomputed here from the raw table)
    val hashes = Dedup.contentHashes(
      graft.core.Tables.documents(spark, sf).select("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def expected(upTo: Long => Boolean): Map[Long, Long] = {
      val mins = hashes.filter(h => upTo(h._1)).groupBy(_._2)
        .map { case (h, rs) => (h, rs.map(_._1).min) }
      hashes.collect { case (id, h) if mins.contains(h) => (id, mins(h)) }.toMap
    }
    val expA = expected(_ < c2).filter { case (id, _) => id >= c1 && id < c2 }
    assert(canonA === expA, "day-1 canonicals must be min over days 0-1")
    val expB = expected(_ => true).filter { case (id, _) => id >= c2 }
    assert(canonB === expB, "day-2 canonicals must be min over days 0-2")
    // canonical stability: re-running day 1 against the store as grown
    // by days 1 AND 2 returns the SAME canonicals — later arrivals
    // (higher ids) can never steal a min-id canonical from the past
    val canonAReplay = canon(Dedup.incrementalExactOf(dayA, store))
    assert(canonAReplay === canonA,
      "a doc's canonical must never change when later batches arrive")
  }

  test("d18: a bloom grown batch-by-batch composes to the gate's verdicts — no false negatives ever") {
    val bloom = tmpDir() + "/bloomstore"
    val store = tmpDir() + "/hashstore_bloom"
    // day 0: the warehouse holds slices {0,1,2}; day 1 ingests slice 3
    val day0 = docFrame(col("doc_id") % 5 < 3)
    DocumentStreams.writeBloomBatch(asDocs(day0), bloom, 0L)
    DocumentStreams.writeHashBatch(asDocs(day0), store, 0L)
    val dayA = docFrame(col("doc_id") % 5 === 3)
    val resA = Dedup.bloomPrefilterOf(dayA, bloom, store).collect()
    // the structural bloom contract at every store state: a key the
    // store HOLDS must probe positive (is_known ⇒ bloom_hit)
    assert(resA.forall(r =>
      !r.getAs[Boolean]("is_known") || r.getAs[Boolean]("bloom_hit")),
      "a bloom filter must never commit a false negative")
    DocumentStreams.writeBloomBatch(asDocs(dayA), bloom, 1L)
    DocumentStreams.writeHashBatch(asDocs(dayA), store, 1L)
    // day 2 (the gate's batch, slice 4) against the twice-grown
    // sidecars: they now cover exactly the gate's stored slice
    // (%5 != 4), so verdicts — bloom_hit, is_known AND the
    // false-positive set — must equal the gate's oracle-checked output
    val dayB = docFrame(col("doc_id") % 5 === 4)
    def rows(df: DataFrame) = df.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getBoolean(2), r.getBoolean(3),
        r.getBoolean(4))).toSeq
    val composed = rows(Dedup.bloomPrefilterOf(dayB, bloom, store))
    val gate = rows(
      graft.SparkEntry.queries("d18_bloom_prefilter")(spark, sf))
    assert(composed === gate,
      "batch-by-batch bloom growth must compose to the one-shot gate answer")
  }

  test("s09/s10 multi-day lifecycle: fold, write back, re-assign — two folds equal one rebuild") {
    import java.math.{BigDecimal => JBD, RoundingMode}
    import graft.functions.Portable.vecD
    graft.plans.VectorExpressions.register(spark)
    val e = graft.core.Tables.embeddings(spark, sf)
    val ids = e.select("vec_id").collect().map(_.getLong(0)).sorted
    val (c1, c2) = (ids(ids.length / 3), ids(2 * ids.length / 3))
    val base = tmpDir()
    // day 0: the index BUILD — label-grouped statistics of the first
    // arrival third, persisted as the sidecar
    Similarity.centroidStats(
      e.filter(col("vec_id") < c1)
        .select(col("label").cast("long").as("clabel"),
          vecD(col("embedding")).as("v")), "clabel")
      .write.parquet(s"$base/day0")
    // days A and B: assign against the CURRENT store, fold, write the
    // next version — the production maintenance loop, twice over
    val dayA = e.filter(col("vec_id") >= c1 && col("vec_id") < c2)
      .select(col("vec_id"), vecD(col("embedding")).as("v"))
    Similarity.foldedCentroidStats(spark.read.parquet(s"$base/day0"), dayA)
      .write.parquet(s"$base/day1")
    val dayB = e.filter(col("vec_id") >= c2)
      .select(col("vec_id"), vecD(col("embedding")).as("v"))
    Similarity.foldedCentroidStats(spark.read.parquet(s"$base/day1"), dayB)
      .write.parquet(s"$base/day2")

    // Reference rebuild, entirely in plain Scala (no operator code):
    // replay both days' argmin assignments from the persisted centroid
    // versions (dotFast is a left-to-right double fold; ties to the
    // lower clabel), then one flat BigDecimal sum over all three days'
    // members per cluster. Exact-decimal statistics must make the two
    // incremental folds EQUAL this from-scratch rebuild.
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def centroids(day: String): Seq[(Long, Array[Double], Double)] =
      spark.read.parquet(s"$base/$day").select("clabel", "cent", "cnrm")
        .collect().map(r => (r.getLong(0),
          r.getSeq[Double](1).toArray, r.getDouble(2))).toSeq
    def assign(cents: Seq[(Long, Array[Double], Double)],
        v: Array[Double]): Long = {
      val nrm = math.sqrt(dot(v, v))
      cents.map { case (cl, c, cn) => (dot(v, c) / (nrm * cn), cl) }
        .minBy { case (ccos, cl) => (-ccos, cl) }._2
    }
    def vecsOf(df: org.apache.spark.sql.DataFrame): Seq[Array[Double]] =
      df.select("v").collect().map(_.getSeq[Double](0).toArray).toSeq
    val members = scala.collection.mutable.Map[Long, Vector[Array[Double]]]()
      .withDefaultValue(Vector.empty)
    e.filter(col("vec_id") < c1)
      .select(col("label").cast("long"), vecD(col("embedding")))
      .collect().foreach(r =>
        members(r.getLong(0)) :+= r.getSeq[Double](1).toArray)
    val centsA = centroids("day0")
    vecsOf(dayA).foreach(v => members(assign(centsA, v)) :+= v)
    val centsB = centroids("day1")
    vecsOf(dayB).foreach(v => members(assign(centsB, v)) :+= v)

    val got = spark.read.parquet(s"$base/day2").collect()
      .map(r => (r.getLong(0),
        (1 to 64).map(i => r.getDecimal(i)).toVector,
        r.getLong(65))).sortBy(_._1)
    assert(got.map(_._1) === members.keys.toSeq.sorted)
    for ((cl, sums, cnt) <- got) {
      val ms = members(cl)
      assert(cnt === ms.length.toLong, s"cluster $cl count")
      for (i <- 0 until 64) {
        val want = ms.map(v => JBD.valueOf(v(i)).setScale(9, RoundingMode.HALF_UP))
          .foldLeft(JBD.ZERO.setScale(9))(_.add(_))
        assert(sums(i).compareTo(want) === 0,
          s"cluster $cl dim ${i + 1}: folded ${sums(i)} != rebuilt $want")
      }
    }
  }

  test("d16: a store already holding the batch's own hashes leaves canonicals unchanged") {
    val store = tmpDir() + "/hashstore_overlap"
    DocumentStreams.writeHashBatch(
      asDocs(docFrame(col("doc_id") % 5 =!= 4)), store, 0L)
    val batch = docFrame(col("doc_id") % 5 === 4)
    val clean = canon(Dedup.incrementalExactOf(batch, store))
    DocumentStreams.writeHashBatch(asDocs(batch), store, 1L)
    assert(canon(Dedup.incrementalExactOf(batch, store)) === clean,
      "self-inclusion must not alter canonicals (min-merge is idempotent)")
  }

  test("d34 store evolution contract: add-nullable only — legacy files null-fill, owned-column reads unaffected, a type change fails loudly") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val root = tmpDir()
    // generation 1: the legacy two-column schema; generation 2: the
    // evolved ingest stamps src_gen — legacy files are never rewritten
    Seq(("h1", 1L), ("h2", 2L)).toDF("content_hash", "stored_canonical")
      .write.parquet(s"$root/gen1")
    Seq(("h3", 3L, 2L))
      .toDF("content_hash", "stored_canonical", "src_gen")
      .write.parquet(s"$root/gen2")
    // evolved reader over BOTH generations as one relation: files
    // lacking the column yield null for it — the supported evolution
    val evolved = StructType(Seq(
      StructField("content_hash", StringType),
      StructField("stored_canonical", LongType),
      StructField("src_gen", LongType)))
    val mixed = spark.read.schema(evolved)
      .parquet(s"$root/gen1", s"$root/gen2")
    assert(mixed.count() === 3)
    assert(mixed.filter(col("src_gen").isNull).count() === 2,
      "legacy files must read the added column as null")
    assert(mixed.filter(col("src_gen") === 2L).count() === 1)
    // coalesce to the documented legacy default — the consumer's move
    assert(mixed.select(coalesce(col("src_gen"), lit(1L)).as("g"))
      .groupBy("g").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L), (2L, 1L)))
    // un-upgraded consumer: projecting only the columns it owns, the
    // new column is invisible and every generation's rows resolve —
    // the store contract that lets producers evolve ahead of consumers
    val legacy = StructType(evolved.fields.take(2))
    val old = spark.read.schema(legacy)
      .parquet(s"$root/gen1", s"$root/gen2")
    assert(old.columns.toSeq === Seq("content_hash", "stored_canonical"))
    assert(old.count() === 3)
    // a TYPE change is NOT an evolution (it demands a rewrite): reading
    // gen2's BIGINT src_gen as STRING must fail loudly, never coerce
    val broken = StructType(evolved.fields.take(2) :+
      StructField("src_gen", StringType))
    intercept[org.apache.spark.SparkException] {
      spark.read.schema(broken).parquet(s"$root/gen2").collect()
    }
  }
}
