package graft.compendium

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class BioSampleXmlSpec extends SparkTestBase {

  lazy val parsed = BioSampleXml.read(spark, s"$fixtures/biosamples.xml")

  test("samples without an SRA id are skipped") {
    val srs = parsed.select("srs").collect().map(_.getString(0)).sorted
    assert(srs === Array("SRS000001", "SRS000003", "SRS000004"))
  }

  test("tags prefer harmonized_name, lowercase values, last duplicate wins") {
    val tags = BioSampleXml.tags(parsed)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val s1 = tags.filter(_._1 == "SRS000001").map(t => t._2 -> t._3).toMap
    assert(s1("host_age") === "34")
    assert(s1("sample type") === "stool")          // attribute_name fallback
    assert(s1("geo_loc_name") === "usa: michigan") // lowercased
    val s3 = tags.filter(_._1 == "SRS000003").map(t => t._2 -> t._3).toMap
    assert(s3("host_age") === "7")                 // duplicate: last wins
    assert(!s3.contains("empty_one"))              // empty value skipped
    assert(s3("material") === "faeces & mucus")    // entity unescaped
    // sample 4 has no attributes at all
    assert(!tags.exists(_._1 == "SRS000004"))
  }

  test("single-quoted attributes and numeric character references parse") {
    val rec = """<BioSample access='public'>
      |<Ids><Id db='SRA'>SRS999999</Id></Ids>
      |<Attributes>
      |<Attribute attribute_name='material'>Stool &#38; Mucus &#x2013; fresh</Attribute>
      |<Attribute harmonized_name="host_age" attribute_name='age'>34</Attribute>
      |</Attributes>""".stripMargin
    val Some((srs, tags)) = BioSampleXml.parseRecord(rec)
    assert(srs === "SRS999999")
    val m = tags.toMap
    assert(m("material") === "stool & mucus – fresh")
    assert(m("host_age") === "34")
  }

  test("ingest into warehouse is idempotent (anti-join re-ingest)") {
    val wh = new Warehouse(spark, tmpDir())
    val n1 = Ingest.loadSamples(spark, wh, "408170", s"$fixtures/biosamples.xml")
    assert(n1 === 3)
    val n2 = Ingest.loadSamples(spark, wh, "408170", s"$fixtures/biosamples.xml")
    assert(n2 === 0)
    assert(wh.read("samples").count() === 3)
    val t1 = Ingest.loadTags(spark, wh, s"$fixtures/biosamples.xml")
    assert(t1 === 5) // SRS000001: 3 tags, SRS000003: 2 (dup collapsed, empty skipped)
    val t2 = Ingest.loadTags(spark, wh, s"$fixtures/biosamples.xml")
    assert(t2 === 0)
  }
}

class ResultsLoadSpec extends SparkTestBase {

  test("counts matrix unpivots to sparse triplets, zeros dropped") {
    val counts = ResultsLoad.readCountsMatrix(spark, s"$fixtures/ASVs_counts.tsv")
    val triplets = counts.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(triplets === Set(
      ("SRR0000001", "ASV_1", 120L), ("SRR0000003", "ASV_1", 5L),
      ("SRR0000001", "ASV_2", 33L), ("SRR0000002", "ASV_2", 17L),
      ("SRR0000003", "ASV_3", 9L)))
  }

  test("FASTA pairs labels with sequences") {
    val fa = ResultsLoad.readFasta(spark, s"$fixtures/ASVs.fa")
    val m = fa.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m.keySet === Set("ASV_1", "ASV_2", "ASV_3"))
    assert(m("ASV_1").startsWith("CCTACGGGAGGCAGCAG"))
    assert(m("ASV_1").length === 66)
  }

  test("full load joins taxonomy to deterministic surrogate ids") {
    val (counts, seqs, assigns) =
      ResultsLoad.load(spark, fixtures, "PRJNA12345")
    assert(counts.count() === 5)
    assert(seqs.count() === 3)
    val a = assigns.collect()
    assert(a.length === 3)
    // assignment asv_id must point at the sequence row of the same ASV
    val seqIds = seqs.collect().map(r => r.getAs[Long]("asv_id")).toSet
    assert(a.map(_.getAs[Long]("asv_id")).toSet === seqIds)
    assert(a.forall(_.getAs[String]("tdatabase") == "silva_nr99_v138_train_set"))
    val genus = assigns.filter(col("genus") === "Bacteroides").collect()
    assert(genus.length === 1)
    // deterministic across runs
    val (_, seqs2, _) = ResultsLoad.load(spark, fixtures, "PRJNA12345")
    assert(seqs2.collect().map(r => r.getAs[Long]("asv_id")).toSet === seqIds)
  }

  test("asv_sequences keeps only taxonomy ASVs; taxonomy-only ASVs raise") {
    // FASTA with an extra ASV not in taxonomy → excluded from seqs
    // (reference builds seqs from taxa.keys(), projects.py:478)
    val dir = tmpDir()
    def cp(n: String) = java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$fixtures/$n"),
      java.nio.file.Paths.get(s"$dir/$n"))
    cp("ASVs_counts.tsv"); cp("ASVs_taxonomy.tsv")
    val fa = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$fixtures/ASVs.fa")), "UTF-8")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/ASVs.fa"),
      fa + ">ASV_99\nACGTACGTACGT\n")
    val (_, seqs, _) = ResultsLoad.load(spark, dir, "PRJNA12345")
    assert(seqs.collect().map(_.getAs[String]("asv")).toSet ===
      Set("ASV_1", "ASV_2", "ASV_3"))

    // taxonomy ASV missing from FASTA → reference KeyError → we raise
    val dir2 = tmpDir()
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$fixtures/ASVs_counts.tsv"),
      java.nio.file.Paths.get(s"$dir2/ASVs_counts.tsv"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$fixtures/ASVs.fa"),
      java.nio.file.Paths.get(s"$dir2/ASVs.fa"))
    val tax = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$fixtures/ASVs_taxonomy.tsv")), "UTF-8")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir2/ASVs_taxonomy.tsv"),
      tax + "ASV_77\tBacteria\tFirmicutes\tClostridia\tOscillospirales\tRuminococcaceae\tFaecalibacterium\n")
    intercept[IllegalStateException] {
      ResultsLoad.load(spark, dir2, "PRJNA12345")
    }
  }
}

class EUtilsSpec extends SparkTestBase {

  test("efetch parse: multi-run ';' join, no-run skip, field extraction") {
    val xml = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$fixtures/efetch_response.xml")), "UTF-8")
    val infos = EUtils.parseResponse(xml)
    assert(infos.map(_.srs) === Seq("SRS000001", "SRS000002")) // no-run skipped
    val one = infos.head
    assert(one.srr === Some("SRR000001"))
    assert(one.project === Some("PRJNA100001"))
    assert(one.pubdate === Some("2024-01-15 08:00:00"))
    assert(one.total_bases === Some(123456789L))
    assert(one.library_strategy === Some("AMPLICON"))
    assert(one.library_source === Some("METAGENOMIC"))
    assert(one.instrument === Some("Illumina MiSeq"))
    val two = infos(1)
    assert(two.srr === Some("SRR000002;SRR000003"))   // db.py:421-431
    assert(two.total_bases === Some(222222L))          // last run wins
  }

  test("enrich aborts after two consecutive fetch failures, keeps earlier work") {
    import spark.implicits._
    val wh = new Warehouse(spark, tmpDir())
    Ingest.loadSamples(spark, wh, "408170", s"$fixtures/biosamples.xml")
    var calls = 0
    val flaky = new EUtilsClient {
      def fetch(batch: Seq[String]): String = {
        calls += 1
        throw new RuntimeException("boom")
      }
    }
    // batch size 1 → 3 unresolved samples → 3 potential batches, but the
    // loop must stop after the 2nd consecutive failure
    val n = EUtils.enrich(spark, wh, flaky, budget = 10,
      EngineConfig.default.copy(eutilsThrottleMs = 0, eutilsBatchSize = 1))
    assert(n === 0)
    assert(calls === 2)
  }

  test("enrich refuses an esearch URL beyond the 1950-char cap") {
    import spark.implicits._
    val wh = new Warehouse(spark, tmpDir())
    val longSrs = (1 to 60).map(i => f"SRS$i%0120d")
    wh.append("samples", longSrs.map(s =>
      (s, null.asInstanceOf[String], null.asInstanceOf[String],
        null.asInstanceOf[String], null.asInstanceOf[String],
        null.asInstanceOf[String], null.asInstanceOf[String],
        null.asInstanceOf[String], null.asInstanceOf[String])).toDF(
      "srs", "project", "taxon", "srr", "library_strategy",
      "library_source", "instrument", "pubdate", "geo_loc_name"))
    val client = new EUtilsClient {
      def fetch(batch: Seq[String]): String = "<EXPERIMENT_PACKAGE_SET/>"
    }
    intercept[IllegalStateException] {
      EUtils.enrich(spark, wh, client, budget = 60,
        EngineConfig.default.copy(eutilsThrottleMs = 0, eutilsBatchSize = 30))
    }
  }

  test("enrich merges into samples via K2 conditional-column upsert") {
    import spark.implicits._
    val wh = new Warehouse(spark, tmpDir())
    Ingest.loadSamples(spark, wh, "408170", s"$fixtures/biosamples.xml")
    val client = new EUtilsClient {
      def fetch(batch: Seq[String]): String =
        new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get("/root/repo/fixtures/efetch_response.xml")), "UTF-8")
    }
    val n = EUtils.enrich(spark, wh, client,
      budget = 10, EngineConfig.default.copy(eutilsThrottleMs = 0))
    assert(n === 2)
    val samples = wh.read("samples")
    val s1 = samples.filter($"srs" === "SRS000001").collect().head
    assert(s1.getAs[String]("srr") === "SRR000001")
    assert(s1.getAs[String]("project") === "PRJNA100001")
    assert(s1.getAs[String]("taxon") === "408170") // untouched column kept
    // SRS000003 had no run info → srr stays null
    val s3 = samples.filter($"srs" === "SRS000003").collect().head
    assert(s3.isNullAt(s3.fieldIndex("srr")))
  }

  test("enrichDistributed equals the driver-side path on the shared fixture; requests obey the global throttle") {
    import spark.implicits._
    def canon(wh: Warehouse) = wh.read("samples").collect()
      .map(_.toSeq).toSet
    // driver-side reference, through the SAME accession-filtering fake
    // (a real efetch answers only the posted accessions; serving the
    // whole fixture to both paths would differ only through batching)
    val whD = new Warehouse(spark, tmpDir())
    Ingest.loadSamples(spark, whD, "408170", s"$fixtures/biosamples.xml")
    FakeEutilsRecorder.reset()
    val nD = EUtils.enrich(spark, whD, FakeEutilsRecorder.recordingClient(),
      budget = 10, EngineConfig.default.copy(eutilsThrottleMs = 0))
    // executor-side path: one-accession batches across 2 partitions so
    // the fan-out is real; the factory closure carries NO client state
    // (each partition constructs its own) and records every request
    FakeEutilsRecorder.reset()
    val whX = new Warehouse(spark, tmpDir())
    Ingest.loadSamples(spark, whX, "408170", s"$fixtures/biosamples.xml")
    val throttleMs = 40L
    val par = 2
    val nX = EUtils.enrichDistributed(spark, whX,
      () => FakeEutilsRecorder.recordingClient(), budget = 10,
      EngineConfig.default.copy(eutilsThrottleMs = throttleMs,
        eutilsBatchSize = 1),
      parallelism = par)
    assert(nX === nD, "the two paths must fetch the same packages")
    assert(canon(whX) === canon(whD),
      "executor-side enrich must leave the samples table identical to the driver-side path")
    // global-throttle invariant: each partition sleeps parallelism ×
    // throttle before EVERY request, so within a partition consecutive
    // requests are ≥ par·throttle apart — fleet rate ≤ 1/throttle
    val calls = FakeEutilsRecorder.calls()
    assert(calls.nonEmpty)
    calls.groupBy(_._1).foreach { case (pid, cs) =>
      val times = cs.map(_._2).sorted
      times.zip(times.tail).foreach { case (a, b) =>
        assert(b - a >= (par * throttleMs - 2) * 1000000L,
          s"partition $pid requests ${(b - a) / 1e6} ms apart — " +
            s"violates the ${par * throttleMs} ms per-partition throttle")
      }
    }
  }

  test("enrichDistributed: two consecutive failures stop a partition's remaining batches; the URL cap merges-then-aborts") {
    import spark.implicits._
    // failure envelope: every fetch throws; 3 unresolved samples at
    // batch size 1 on ONE partition → exactly 2 calls, like the driver
    FakeEutilsRecorder.reset()
    val wh = new Warehouse(spark, tmpDir())
    Ingest.loadSamples(spark, wh, "408170", s"$fixtures/biosamples.xml")
    val giveUp = intercept[IllegalStateException] {
      EUtils.enrichDistributed(spark, wh,
        () => FakeEutilsRecorder.failingClient(), budget = 10,
        EngineConfig.default.copy(eutilsThrottleMs = 0, eutilsBatchSize = 1),
        parallelism = 1)
    }
    // the give-up must be LOUD (merge-then-throw, like the URL cap and
    // the driver path's two-in-a-row bail) — a normal return here would
    // be indistinguishable from a clean run
    assert(giveUp.getMessage.contains("gave up after 2 consecutive"))
    // 3 batches total: 1 never attempted + the 2 that failed — the
    // count must include the failed ones ("0 unfetched" on a last-two-
    // batches failure would read as no data loss)
    assert(giveUp.getMessage.contains("3 batches unfetched"))
    assert(FakeEutilsRecorder.calls().size === 2,
      "the partition must stop after the 2nd consecutive failure")
    // URL cap: same long-accession shape as the driver-side cap test
    val wh2 = new Warehouse(spark, tmpDir())
    val longSrs = (1 to 60).map(i => f"SRS$i%0120d")
    wh2.append("samples", longSrs.map(s =>
      (s, null.asInstanceOf[String], null.asInstanceOf[String],
        null.asInstanceOf[String], null.asInstanceOf[String],
        null.asInstanceOf[String], null.asInstanceOf[String],
        null.asInstanceOf[String], null.asInstanceOf[String])).toDF(
      "srs", "project", "taxon", "srr", "library_strategy",
      "library_source", "instrument", "pubdate", "geo_loc_name"))
    intercept[IllegalStateException] {
      EUtils.enrichDistributed(spark, wh2,
        () => FakeEutilsRecorder.emptyClient(), budget = 60,
        EngineConfig.default.copy(eutilsThrottleMs = 0,
          eutilsBatchSize = 30),
        parallelism = 2)
    }
  }
}

/** Spec-side serializable fakes for the executor-side enrich path: the
  * factory closures ship to tasks, so the fakes live in a top-level
  * object (no Spec-instance capture) and record through a JVM-static
  * buffer (local[*]: executors share the JVM).
  */
object FakeEutilsRecorder extends Serializable {
  val fixturePath = "/root/repo/fixtures/efetch_response.xml"
  private val buf =
    new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
  def reset(): Unit = buf.clear()
  def calls(): Seq[(Int, Long)] = {
    val it = buf.iterator()
    val b = Seq.newBuilder[(Int, Long)]
    while (it.hasNext) b += it.next()
    b.result()
  }
  private def record(): Unit =
    buf.add((org.apache.spark.TaskContext.getPartitionId(),
      System.nanoTime()))
  /** Serves the fixture RESTRICTED to the requested accessions — a real
    * efetch answers only the posted search, and the per-accession
    * batching of the distributed test would otherwise multiply packages.
    */
  def recordingClient(): EUtilsClient = new EUtilsClient {
    def fetch(batch: Seq[String]): String = {
      record()
      val xml = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(fixturePath)), "UTF-8")
      xml.split("""(?=<EXPERIMENT_PACKAGE[>\s])""").toSeq
        .filter(c => !c.startsWith("<EXPERIMENT_PACKAGE") ||
          batch.exists(c.contains))
        .mkString("")
    }
  }
  def failingClient(): EUtilsClient = new EUtilsClient {
    def fetch(batch: Seq[String]): String = {
      record(); throw new RuntimeException("boom")
    }
  }
  def emptyClient(): EUtilsClient = new EUtilsClient {
    def fetch(batch: Seq[String]): String = "<EXPERIMENT_PACKAGE_SET/>"
  }
}
