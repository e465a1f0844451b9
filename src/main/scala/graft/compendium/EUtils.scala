package graft.compendium

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** S2+K2 (SURVEY.md §3.3): eUtils run-accession enrichment.
  *
  * The HTTP side effect lives behind [[EUtilsClient]] so the engine stays
  * pure and testable; the response parser reproduces db.py:388-438 exactly:
  *  - SAMPLE accession: last wins; RUN accessions accumulate and join with
  *    ';' when multiple (db.py:421-431);
  *  - pubdate / total_bases: last RUN's attribute wins;
  *  - first BioProject EXTERNAL_ID wins (break, db.py:411-414);
  *  - LIBRARY_STRATEGY / LIBRARY_SOURCE / INSTRUMENT_MODEL: last wins;
  *  - packages without any run are skipped (db.py:433-438).
  */
trait EUtilsClient {
  /** Resolve a batch of ≤`per_query` SRS accessions → raw efetch XML. */
  def fetch(batch: Seq[String]): String
}

/** Default [[EUtilsClient]] over `java.net.http`: the reference's two-step
  * esearch(usehistory=y) → parse WebEnv → efetch(WebEnv) flow
  * (db.py:304-372), with the reference's 25 s request timeout
  * (config_template.py:30). Throttling, the 1950-char URL cap, and the
  * two-consecutive-failures abort live in [[EUtils.enrich]], which treats
  * any exception thrown here as one failed batch.
  *
  * Deliberately not exercised by unit tests — the sandbox has no network;
  * the enrich envelope is tested against fake clients. Constructing the
  * class performs no I/O.
  */
final class HttpEUtilsClient(cfg: EngineConfig = EngineConfig.default)
    extends EUtilsClient {
  import java.net.http.{HttpClient, HttpRequest, HttpResponse}

  private lazy val http = HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(cfg.eutilsTimeoutSec.toLong))
    .followRedirects(HttpClient.Redirect.NORMAL)
    .build()

  private def get(url: String): String = {
    val req = HttpRequest.newBuilder(java.net.URI.create(url))
      .timeout(java.time.Duration.ofSeconds(cfg.eutilsTimeoutSec.toLong))
      .GET().build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new java.io.IOException(
        s"eUtils HTTP ${resp.statusCode()} for ${url.takeWhile(_ != '?')}")
    resp.body()
  }

  override def fetch(batch: Seq[String]): String = {
    val search = get(EUtils.esearchUrl(batch))
    // The reference skips (and counts a failure) when the esearch response
    // carries no WebEnv (db.py:345-352) — surfacing that as an exception
    // reaches the same consecutive-failure accounting in enrich().
    val webenv = """<WebEnv>([^<]+)</WebEnv>""".r.findFirstMatchIn(search)
      .map(_.group(1)).getOrElse(throw new java.io.IOException(
        "esearch response has no WebEnv field (db.py:345-352)"))
    get(EUtils.efetchUrl(webenv))
  }
}

object EUtils {

  private val TagRe = """(?s)<(\w+)\b([^>/]*)(/?)>""".r
  private val XmlAttrRe = """([\w:_-]+)\s*=\s*"([^"]*)"""".r

  private def attrs(s: String): Map[String, String] =
    XmlAttrRe.findAllMatchIn(s)
      .map(m => m.group(1) -> BioSampleXml.unescape(m.group(2))).toMap

  private def elemText(chunk: String, tag: String): Option[String] = {
    val re = s"""(?s)<$tag\\b[^>]*>(.*?)</$tag>""".r
    re.findAllMatchIn(chunk).toSeq.lastOption
      .map(m => BioSampleXml.unescape(m.group(1)).trim)
  }

  /** Parse one EXPERIMENT_PACKAGE chunk. */
  private[compendium] def parsePackage(chunk: String): Option[SraRunInfo] = {
    var sample: Option[String] = None
    for (m <- """(?s)<SAMPLE\b([^>]*)>""".r.findAllMatchIn(chunk))
      attrs(m.group(1)).get("accession").foreach(a => sample = Some(a))
    var runs = Vector.empty[String]
    var pubdate: Option[String] = None
    var totalBases: Option[Long] = None
    for (m <- """(?s)<RUN\b([^>]*?)/?>""".r.findAllMatchIn(chunk)) {
      val a = attrs(m.group(1))
      a.get("accession").foreach(runs :+= _)
      a.get("published").foreach(p => pubdate = Some(p))
      a.get("total_bases").foreach(b => totalBases = b.toLongOption)
    }
    val project = """(?s)<EXTERNAL_ID\b([^>]*)>(.*?)</EXTERNAL_ID>""".r
      .findAllMatchIn(chunk)
      .find(m => attrs(m.group(1)).get("namespace").contains("BioProject"))
      .map(m => BioSampleXml.unescape(m.group(2)).trim)
    if (runs.isEmpty || sample.isEmpty) None // skip: no run (db.py:433-438)
    else Some(SraRunInfo(
      srs = sample.get,
      srr = Some(runs.mkString(";")),
      project = project,
      pubdate = pubdate,
      total_bases = totalBases,
      library_strategy = elemText(chunk, "LIBRARY_STRATEGY"),
      library_source = elemText(chunk, "LIBRARY_SOURCE"),
      instrument = elemText(chunk, "INSTRUMENT_MODEL")))
  }

  /** Split a response into EXPERIMENT_PACKAGE chunks and parse each. */
  def parseResponse(xml: String): Seq[SraRunInfo] =
    xml.split("""(?=<EXPERIMENT_PACKAGE[>\s])""").toSeq
      .filter(_.startsWith("<EXPERIMENT_PACKAGE"))
      .flatMap(parsePackage)

  /** The esearch URL the reference builds per batch (db.py:303-317) — used
    * for the 1950-char hard cap check even though the HTTP call itself
    * lives behind the client boundary.
    */
  def esearchUrl(batch: Seq[String]): String =
    "https://eutils.ncbi.nlm.nih.gov/entrez/eutils/esearch.fcgi?db=sra&term=" +
      batch.map(_ + "[accn]").mkString("+OR+") + "&usehistory=y"

  /** The efetch URL for a previously-posted search session
    * (config_template.py:34 + db.py:355): `query_key` is always 1 because
    * each esearch posts exactly one query to a fresh history session.
    */
  def efetchUrl(webenv: String): String =
    "https://eutils.ncbi.nlm.nih.gov/entrez/eutils/efetch.fcgi?db=sra" +
      s"&query_key=1&WebEnv=$webenv"

  /** `main.py runs <N>` (db.py:266-330): pick N unresolved samples, fetch in
    * `batchSize` chunks via the injected client, merge results into
    * `samples` (K2). The fan-out is driver-side like the reference — the
    * bottleneck is NCBI throttling (0.5 s/request), not compute — but the
    * merge itself is a distributed join.
    *
    * Operational envelope preserved (BASELINE.md): URL hard cap of 1950
    * chars aborts the session (db.py:314-317); two CONSECUTIVE fetch
    * failures abort further batches while keeping earlier results
    * (db.py:326-384); a success resets the failure counter.
    */
  def enrich(spark: SparkSession, wh: Warehouse, client: EUtilsClient,
      budget: Int, cfg: EngineConfig = EngineConfig.default): Long = {
    import spark.implicits._
    val samples = wh.readOrEmpty("samples", Schemas.samples)
    val todo = Selection.unresolvedSamples(samples, budget)
      .as[String].collect().toSeq
    var consecutiveFailures = 0
    val infos = Vector.newBuilder[SraRunInfo]
    // The reference persists each batch (_record_data, db.py:440-470) before
    // its hard exits, so a URL-cap abort must not discard batches already
    // fetched: accumulate, merge what we have, then rethrow.
    var abort: Option[Throwable] = None
    val it = todo.grouped(cfg.eutilsBatchSize)
    while (it.hasNext && consecutiveFailures < 2 && abort.isEmpty) {
      val batch = it.next()
      val url = esearchUrl(batch)
      if (url.length > cfg.eutilsUrlMaxChars)
        abort = Some(new IllegalStateException(
          s"esearch URL ${url.length} chars exceeds ${cfg.eutilsUrlMaxChars} (db.py:314-317)"))
      else {
        Thread.sleep(cfg.eutilsThrottleMs) // NCBI rate limit (db.py:321)
        try {
          infos ++= parseResponse(client.fetch(batch))
          consecutiveFailures = 0
        } catch {
          case scala.util.control.NonFatal(_) =>
            consecutiveFailures += 1
        }
      }
    }
    val merged = mergeInfos(spark, wh, infos.result())
    abort.foreach(e => throw e)
    merged
  }

  /** [[enrich]]'s EXECUTOR-SIDE twin. The driver-side loop stays the
    * DEFAULT (reference parity — the bottleneck is NCBI throttling, not
    * compute), but at fleet scale the fetch fans out: the driver builds
    * the SAME deterministic batch sequence (`grouped(eutilsBatchSize)` —
    * the 80-per-query envelope), slices it contiguously over
    * `parallelism` partitions, and each partition runs the driver
    * loop's envelope locally —
    *
    *   - its own client, constructed ON the executor via
    *     `clientFactory` (HTTP clients don't serialize; the factory
    *     closure must);
    *   - the 1950-char URL hard cap (db.py:314-317), which stops that
    *     partition and, after every fetched batch has merged, aborts
    *     the call — the reference's persist-then-exit discipline;
    *   - two CONSECUTIVE failures stop that partition's remaining
    *     batches while other partitions continue (db.py:326-384 applied
    *     per worker — the driver loop's global counter has no
    *     distributed equivalent that isn't a barrier); the give-up is
    *     RECORDED alongside the URL-cap abort markers and raised after
    *     every partition's results have merged (persist-then-exit, the
    *     same loud bail as the driver path — a caller can never mistake
    *     a partial run for a clean one);
    *   - a per-request sleep of `parallelism × eutilsThrottleMs` plus a
    *     per-partition PHASE stagger on the first request (worker p
    *     starts p slots late), so the FLEET-wide request rate never
    *     exceeds the single-driver NCBI budget of one request per
    *     eutilsThrottleMs — as an interleaved stream, not as P-request
    *     bursts whose average merely equals it (spec-asserted per
    *     partition with a recording fake): P workers × rate 1/(P·t)
    *     = 1/t.
    *
    * Results merge through the same [[mergeInfos]] upsert as the driver
    * path, so on a clean run the two paths are provably
    * output-identical (EUtilsSpec pins it on the shared fixture).
    */
  def enrichDistributed(spark: SparkSession, wh: Warehouse,
      clientFactory: () => EUtilsClient, budget: Int,
      cfg: EngineConfig = EngineConfig.default,
      parallelism: Int = 4): Long = {
    import spark.implicits._
    require(parallelism >= 1, "parallelism must be at least 1")
    val samples = wh.readOrEmpty("samples", Schemas.samples)
    val todo = Selection.unresolvedSamples(samples, budget)
      .as[String].collect().toSeq
    val batches = todo.grouped(cfg.eutilsBatchSize).toVector
    if (batches.isEmpty) return 0L
    val perRequestSleepMs = cfg.eutilsThrottleMs * parallelism
    val throttleMs = cfg.eutilsThrottleMs
    val urlMax = cfg.eutilsUrlMaxChars
    val fetched = spark.sparkContext
      .parallelize(batches, math.min(parallelism, batches.size))
      .mapPartitions { it =>
        val client = clientFactory()
        // PHASE-stagger the first request by the partition index: with
        // identical sleeps from a common start, P workers would fire
        // P-request bursts every P slots — the AVERAGE rate meets the
        // budget but the instantaneous burst is what a per-second
        // limiter rejects. Worker p starting p throttle-slots late
        // interleaves the fleet at one request per slot (request-latency
        // drift can still re-align phases over long sessions; the
        // per-request P×throttle sleep keeps even a fully re-aligned
        // fleet at the average budget).
        var nextSleepMs = perRequestSleepMs +
          org.apache.spark.TaskContext.getPartitionId().toLong * throttleMs
        var consecutiveFailures = 0
        var abort: Option[String] = None
        val out = Vector.newBuilder[(Seq[SraRunInfo], Option[String])]
        while (it.hasNext && consecutiveFailures < 2 && abort.isEmpty) {
          val batch = it.next()
          val url = esearchUrl(batch)
          if (url.length > urlMax)
            abort = Some(s"esearch URL ${url.length} chars exceeds " +
              s"$urlMax (db.py:314-317)")
          else {
            Thread.sleep(nextSleepMs)
            nextSleepMs = perRequestSleepMs
            try {
              out += ((parseResponse(client.fetch(batch)), None))
              consecutiveFailures = 0
            } catch {
              case scala.util.control.NonFatal(_) =>
                consecutiveFailures += 1
            }
          }
        }
        abort.foreach(a => out += ((Seq.empty, Some(a))))
        // a give-up must survive the fan-out: without a marker the
        // driver merges whatever succeeded and returns a NORMAL count,
        // indistinguishable from a clean run (the driver path and
        // db.py:326-384 both bail loudly on two-in-a-row)
        if (consecutiveFailures >= 2) {
          // unfetched = the never-attempted remainder PLUS the two
          // failed batches themselves ("0 unfetched" on a last-two-
          // batches failure would read as no data loss); capture the
          // remainder into a val — it.size DRAINS the iterator, which
          // is safe only done once, here, after the loop is over
          val remaining = it.size
          out += ((Seq.empty, Some(
            s"partition ${org.apache.spark.TaskContext.getPartitionId()} " +
              s"gave up after 2 consecutive fetch failures with " +
              s"${remaining + 2} batches unfetched (incl. the 2 failed; " +
              s"db.py:326-384)")))
        }
        Iterator.single(out.result())
      }.collect().toSeq.flatten
    val merged = mergeInfos(spark, wh, fetched.flatMap(_._1))
    fetched.flatMap(_._2).headOption
      .foreach(m => throw new IllegalStateException(m))
    merged
  }

  private def mergeInfos(spark: SparkSession, wh: Warehouse,
      infos: Seq[SraRunInfo]): Long = {
    import spark.implicits._
    if (infos.isEmpty) return 0L
    // Option fields encode as nullable columns
    val delta = infos.toDF()
      .select(col("srs"), col("srr"), col("project"),
        to_timestamp(col("pubdate")).as("pubdate"),
        col("total_bases"), col("library_strategy"),
        col("library_source"), col("instrument"))
    // K2 is an UPDATE, not an INSERT (db.py:445-470): responses for samples
    // we don't track must not create rows.
    wh.upsert("samples", delta, "srs", insertNew = false)
    infos.size.toLong
  }
}
