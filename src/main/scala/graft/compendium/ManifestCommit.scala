package graft.compendium

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Manifest-pointer commits over a warehouse root — the transactional
  * layer that closes the two documented visibility gaps of rename-swap
  * storage ([[Warehouse.replace]]'s S3 caveat, and the view-then-base
  * window in the IVM epoch apply, where a reader interleaved between the
  * two renames can see a NEW view over an OLD base):
  *
  *   - writers stage every table of a commit into fresh VERSIONED
  *     directories (`<table>__v<N>` — never reused, never renamed), then
  *     flip ONE small manifest file naming the current directory of every
  *     table. The flip is a create-exclusive write of a new log file
  *     (`_log/v<N>.manifest`), atomic on any store with atomic single-file
  *     create (rename-free, so the S3 caveat does not apply);
  *   - readers resolve a table through the highest manifest version and
  *     hold that resolution for as many tables as they need — a multi-table
  *     read through one manifest is consistent BY CONSTRUCTION, because a
  *     commit never mutates a directory an older manifest names.
  *
  * This is the Delta/Iceberg log-pointer shape reduced to its essence: the
  * log entry is the whole current-state map (table → directory), not a
  * delta, so recovery needs only the single highest file. A crash anywhere
  * before the manifest create leaves staged orphan directories (garbage,
  * swept by the next commit's GC) and readers never see them; a crash
  * after it leaves a fully committed state. Concurrency contract matches
  * [[Warehouse]]: one writer (create-exclusive makes a second concurrent
  * committer FAIL LOUDLY rather than corrupt), any number of readers.
  *
  * `retain` keeps the last N versions' directories on disk so an in-flight
  * reader holding a just-superseded manifest still finds its files — the
  * reader-horizon knob every log-pointer store exposes (Delta's
  * deletedFileRetentionDuration, here in versions instead of time).
  */
final class ManifestCommit(spark: SparkSession, root: String,
    retain: Int = 2) {
  require(retain >= 1, "retain must keep at least the current version")

  /** The session store reads/writes plan through — epoch-scoped conf
    * (EventStreams.withPackedScans) must target THIS session, not the
    * micro-batch clone foreachBatch binds its batch frame to.
    */
  private[graft] def session: SparkSession = spark

  private val logDir = new Path(s"$root/_log")
  private def fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestPath(v: Long) = new Path(logDir, f"v$v%012d.manifest")

  private def versions(): Seq[Long] =
    if (!fs.exists(logDir)) Seq.empty
    else fs.listStatus(logDir).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".manifest"))
      .map(n => n.stripPrefix("v").stripSuffix(".manifest").toLong)
      .sorted

  def currentVersion(): Option[Long] = versions().lastOption

  /** The table→directory map at version `v`. */
  def manifestAt(v: Long): Map[String, String] = {
    val in = fs.open(manifestPath(v))
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty)
      .map { line =>
        val i = line.indexOf('\t')
        line.substring(0, i) -> line.substring(i + 1)
      }.toMap
    finally in.close()
  }

  /** The current table→directory map — resolve ONCE and read every table
    * of a multi-table invariant through the same resolution.
    */
  def current(): Map[String, String] =
    currentVersion().map(manifestAt).getOrElse(Map.empty)

  def exists(table: String): Boolean = current().contains(table)

  /** Read `table` through the CURRENT manifest. For multi-table
    * consistency, resolve [[current]] once and use [[readAt]].
    */
  def read(table: String): DataFrame = readAt(current(), table)

  /** Optional explicit schema on every read path: parquet relation
    * creation without one pays driver-side footer inference per
    * DataFrame creation (~85 ms warm at sf0.1) — a per-epoch tax for
    * the IVM appliers, which create several fresh store relations per
    * epoch. Callers that know their store's schema (they all wrote it)
    * pass it; `None` keeps inference. Metadata only — the scan still
    * reads the files at execution.
    */
  private def reader(schema: Option[org.apache.spark.sql.types.StructType]) =
    schema.fold(spark.read)(spark.read.schema)

  def readAt(manifest: Map[String, String], table: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame =
    reader(schema).parquet(s"$root/${manifest(table)}")

  private[graft] def hadoopConf: org.apache.hadoop.conf.Configuration =
    spark.sparkContext.hadoopConfiguration

  /** The committed directory of `table` under `manifest` — for the
    * driver-direct sidecar read ([[graft.core.TinyParquet]]), which
    * needs the path, not a DataFrame.
    */
  private[graft] def dirAt(manifest: Map[String, String],
      table: String): Path = new Path(s"$root/${manifest(table)}")

  /** Several SAME-SCHEMA manifest tables as ONE multi-path relation —
    * the segment-family read shape (erased-id segments, LSM-style
    * append families): one relation's listing/footer resolution instead
    * of |tables| unioned ones per consumer job.
    */
  def readPaths(manifest: Map[String, String], tables: Seq[String],
      schema: Option[org.apache.spark.sql.types.StructType] = None)
      : DataFrame =
    reader(schema).parquet(tables.map(t => s"$root/${manifest(t)}"): _*)

  /** Partition keys of a partition-granular table: the manifest entries
    * `table/<partCol>=<value>`, one per live partition directory.
    */
  def partitionKeys(manifest: Map[String, String], table: String)
      : Seq[String] =
    manifest.keys.filter(_.startsWith(table + "/")).toSeq.sorted

  /** The LIVE partition values of a partition-granular table — the one
    * parser of the `table/partCol=<v>` key grammar (bucket values are
    * LONG by the IVM convention); every caller that needs "all
    * partitions" goes through here instead of re-implementing the
    * substring split.
    */
  def partitionValues(manifest: Map[String, String], table: String)
      : Seq[Long] =
    partitionKeys(manifest, table).map { k =>
      val kv = k.substring(k.indexOf('/') + 1)
      kv.substring(kv.indexOf('=') + 1).toLong
    }

  /** Read SOME partitions of a partition-granular table through one
    * manifest resolution — the pruned read: absent values (a partition
    * never written, or swept empty) simply contribute nothing, and
    * directories outside `values` are never listed, never opened. The
    * partition column is restored from the manifest key (staged files
    * do not carry it — `partitionBy` moved it into the directory name);
    * bucket keys are LONG by the IVM convention. Returns None when no
    * requested partition exists.
    */
  def readPartitionsAt(manifest: Map[String, String], table: String,
      partCol: String, values: Seq[Long],
      schema: Option[org.apache.spark.sql.types.StructType] = None)
      : Option[DataFrame] = {
    val frames = values.flatMap { v =>
      manifest.get(s"$table/$partCol=$v").map(dir =>
        reader(schema).parquet(s"$root/$dir")
          .withColumn(partCol, org.apache.spark.sql.functions.lit(v)))
    }
    frames.reduceOption(_ unionByName _)
  }

  /** The selected partitions as ONE multi-path relation, WITHOUT the
    * partition column — for callers whose partition key is DERIVABLE
    * from data columns (the IVM stores: pk = k mod B, pck = ck mod B).
    * One relation instead of |values| unioned ones matters: every
    * consumer job re-resolves each relation (driver-side listing +
    * footer read per directory), so the unioned form pays
    * O(partitions × consumers) driver work per epoch where this pays
    * O(consumers).
    */
  def readPartitionPathsAt(manifest: Map[String, String], table: String,
      partCol: String, values: Seq[Long],
      schema: Option[org.apache.spark.sql.types.StructType] = None)
      : Option[DataFrame] = {
    val paths = values.flatMap(v => manifest.get(s"$table/$partCol=$v"))
      .map(d => s"$root/$d")
    if (paths.isEmpty) None else Some(reader(schema).parquet(paths: _*))
  }

  /** Read the WHOLE partition-granular family of `table`. */
  def readPartitionedAt(manifest: Map[String, String], table: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None)
      : Option[DataFrame] =
    partitionKeys(manifest, table).headOption.flatMap { k =>
      val kv = k.substring(k.indexOf('/') + 1)
      readPartitionsAt(manifest, table, kv.substring(0, kv.indexOf('=')),
        partitionValues(manifest, table), schema)
    }

  /** Atomically commit `writes` as one new version: every frame stages to
    * a fresh `<table>__v<N>` directory, tables NOT in `writes` carry their
    * previous directories forward, and the single manifest create makes
    * the whole set visible at once — the (base, view, marker) trio flips
    * together or not at all. Tables named in `drop` leave the manifest in
    * the same flip (their directories stay on disk until the retain
    * horizon passes, then GC sweeps them) — the segment-compaction shape:
    * N small append segments merge into one table and vanish from the map
    * in a single atomic commit. Returns the committed version.
    */
  def commit(writes: Map[String, DataFrame],
      drop: Set[String] = Set.empty,
      tiny: Map[String, ManifestCommit.TinyTable] = Map.empty): Long =
    commitAs(currentVersion().getOrElse(0L) + 1L, writes, drop, tiny)

  /** The version-pinned commit body — separated so the concurrent-writer
    * contract is testable: a committer whose version was taken by a race
    * winner lands HERE with the stale v and must fail on the exclusive
    * manifest create, never overwrite.
    */
  private[compendium] def commitAs(v: Long,
      writes: Map[String, DataFrame],
      drop: Set[String] = Set.empty,
      tiny: Map[String, ManifestCommit.TinyTable] = Map.empty): Long =
    commitPartitionedAs(v, Map.empty, writes, drop, tiny)

  /** [[commit]] extended with PARTITION-GRANULAR tables — the fact-scale
    * commit shape: `partWrites` maps a table to `(partCol, df, touched)`
    * where `df` holds the NEW content of exactly the `touched` partition
    * values (df's partCol column decides placement; bucket values are
    * LONG). The frame stages in ONE `partitionBy` write job into a fresh
    * versioned parent, each produced `partCol=<v>` subdirectory becomes
    * the manifest entry `table/partCol=<v>`, every untouched partition
    * carries its previous directory forward (byte-stable on disk, entry
    * unchanged), and a touched value that produced no rows leaves the
    * manifest — the emptied-partition sweep as a map edit. Flat `writes`
    * (the marker) ride the same single flip, so (base partitions, view
    * partitions, marker) become visible together or not at all.
    */
  def commitPartitioned(
      partWrites: Map[String, (String, DataFrame, Seq[Long])],
      writes: Map[String, DataFrame] = Map.empty,
      drop: Set[String] = Set.empty,
      tiny: Map[String, ManifestCommit.TinyTable] = Map.empty): Long =
    commitPartitionedAs(currentVersion().getOrElse(0L) + 1L,
      partWrites, writes, drop, tiny)

  private[compendium] def commitPartitionedAs(v: Long,
      partWrites: Map[String, (String, DataFrame, Seq[Long])],
      writes: Map[String, DataFrame],
      drop: Set[String],
      tiny: Map[String, ManifestCommit.TinyTable] = Map.empty): Long = {
    val prev: Map[String, String] =
      (if (v <= 1) Map.empty[String, String] else manifestAt(v - 1)) -- drop
    // the attempt token makes staging dirs WRITER-UNIQUE: two committers
    // racing to one version must not overwrite each other's staged files
    // either — the loser's orphan dirs are garbage, not corruption, and
    // the exclusive manifest create below still decides the winner
    val token = java.util.UUID.randomUUID().toString.take(8)
    val staged = (writes.keys ++ tiny.keys)
      .map(t => t -> s"${t}__v${v}_$token").toMap
    // TINY sidecars (replay/forget markers: driver-held, lineage-bounded
    // row sets) stage as ONE direct driver-side file create — same
    // versioned-directory discipline and the same single manifest flip,
    // but no Spark job per epoch (guide §1.2: the job moved no data)
    tiny.foreach { case (table, (cols, rows)) =>
      graft.core.TinyParquet.write(hadoopConf,
        new Path(s"$root/${staged(table)}"), cols, rows)
    }
    // Stage all tables of the commit CONCURRENTLY (optimization guide
    // §2.6): the staging writes are independent jobs into disjoint fresh
    // directories, and the commit point is the single manifest create
    // AFTER every write returns — so overlapping them changes nothing a
    // reader can observe while collapsing the epoch's staging wall-clock
    // from the sum of the writes to their max (each write's fixed cost —
    // committer setup, file open/close, footer — dominates at
    // change-bounded batch sizes, and the tail of one write's job
    // back-fills the next one's). 2-3 in flight is the guide's "enough
    // to fill the tail" number; job groups/descriptions are thread-local
    // so each staged write keeps its own label.
    val flatJobs: Seq[() => Seq[(String, String)]] =
      writes.toSeq.map { case (table, df) =>
        () =>
          graft.core.Jobs.described(spark, s"mc: stage $table") {
            df.write.mode(SaveMode.Overwrite)
              .parquet(s"$root/${staged(table)}")
          }
          Nil
      }
    val partJobs: Seq[() => Seq[(String, String)]] =
      partWrites.toSeq.map { case (table, (partCol, df, _)) =>
        () => {
          val parent = s"${table}__v${v}_$token"
          // CLUSTER by the partition column before the partitionBy write
          // — unclustered, every task holding rows of k partitions writes
          // k files (tasks × dirs sprayed files per epoch). REBALANCE
          // (not repartition): same same-value-same-task clustering, but
          // AQE sizes the shuffle output by bytes — tiny epochs collapse
          // to one write task instead of |buckets| fixed-cost tasks, and
          // an oversized hot partition may split into several
          // target-sized files (the guide §6 write-sizing shape).
          graft.core.Jobs.described(spark, s"mc: stage $table") {
            df.hint("rebalance", org.apache.spark.sql.functions.col(partCol))
              .write.mode(SaveMode.Overwrite).partitionBy(partCol)
              .parquet(s"$root/$parent")
          }
          val produced = fs.listStatus(new Path(s"$root/$parent")).toSeq
            .filter(_.isDirectory).map(_.getPath.getName)
            .filter(_.startsWith(partCol + "="))
          produced.map(p => s"$table/$p" -> s"$parent/$p")
        }
      }
    val stagingJobs = flatJobs ++ partJobs
    val partEntries: Seq[(String, String)] =
      if (stagingJobs.sizeIs <= 1) stagingJobs.flatMap(_.apply())
      else {
        import scala.concurrent.{Await, ExecutionContext, Future}
        import scala.concurrent.duration.Duration
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          math.min(3, stagingJobs.size))
        try {
          implicit val ec: ExecutionContext =
            ExecutionContext.fromExecutorService(pool)
          Await.result(
            Future.sequence(stagingJobs.map(j => Future(j()))),
            Duration.Inf).flatten
        } finally pool.shutdown()
      }
    val touchedKeys = partWrites.flatMap {
      case (table, (partCol, _, touched)) =>
        touched.map(x => s"$table/$partCol=$x")
    }.toSet
    val next = (prev -- touchedKeys) ++ partEntries ++ staged
    val body = next.toSeq.sorted.map { case (t, d) => s"$t\t$d" }
      .mkString("", "\n", "\n")
    // create-exclusive: a concurrent committer racing to the same version
    // fails here (no torn or last-writer-wins manifest), and readers only
    // ever list COMPLETE files because the content is written before close
    val out = fs.create(manifestPath(v), false)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    gc(v)
    v
  }

  /** Drop manifests older than the retain horizon and every versioned
    * directory no retained manifest references. Runs AFTER the flip, so a
    * crash mid-GC leaves only unreachable garbage, never a dangling
    * manifest. Directories referenced by ANY retained manifest survive —
    * a table last rewritten many versions ago keeps its old directory for
    * as long as a live manifest names it.
    */
  private def gc(committed: Long): Unit = {
    val keepVersions = versions().filter(_ > committed - retain)
    val fullRefs = keepVersions.flatMap(v => manifestAt(v).values).toSet
    // a partition-granular entry references `<parent>/<partCol>=<v>`:
    // its PARENT staging dir is live as long as any subdirectory is
    val parentRefs = fullRefs.map(_.split('/').head)
    versions().filterNot(keepVersions.contains)
      .foreach(v => fs.delete(manifestPath(v), false))
    val rootPath = new Path(root)
    val stagedDirs = fs.listStatus(rootPath).toSeq
      .filter(s => s.isDirectory &&
        s.getPath.getName.matches(".+__v\\d+_[0-9a-f]+") &&
        // never sweep a version being staged ABOVE the committed one
        // (a concurrent writer's work-in-progress is not garbage)
        s.getPath.getName.replaceAll("^.+__v", "")
          .replaceAll("_.*$", "").toLong <= committed)
    stagedDirs.filterNot(s => parentRefs.contains(s.getPath.getName))
      .foreach(s => fs.delete(s.getPath, true))
    // SUBDIR-grain sweep inside partition-granular parents: a rewritten
    // partition's old `partCol=<v>` directory must free even while its
    // parent still hosts carried-forward live partitions — without this
    // a hot partition's history pins the whole parent forever. Flat
    // tables (parent itself referenced) are never descended into.
    stagedDirs
      .filter(s => parentRefs.contains(s.getPath.getName) &&
        !fullRefs.contains(s.getPath.getName))
      .foreach { s =>
        fs.listStatus(s.getPath).toSeq
          .filter(d => d.isDirectory && d.getPath.getName.contains("=") &&
            !fullRefs.contains(s"${s.getPath.getName}/${d.getPath.getName}"))
          .foreach(d => fs.delete(d.getPath, true))
      }
  }
}

object ManifestCommit {
  /** A driver-held tiny table for the direct staging path: column
    * (name, type) pairs plus the rows, in column order.
    */
  type TinyTable =
    (Seq[(String, graft.core.TinyParquet.ColType)], Seq[Seq[Any]])
}
