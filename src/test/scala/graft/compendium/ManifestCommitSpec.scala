package graft.compendium

import graft.SparkTestBase

/** The manifest-pointer commit's two guarantees, pinned:
  *
  *   1. MULTI-TABLE ATOMICITY — a reader that resolves ONE manifest sees a
  *      consistent (base, view) pair even when a commit lands between its
  *      two table reads; the rename-swap path's documented window (new
  *      view over old base, Warehouse.replace's S3 caveat) cannot occur
  *      because a commit never mutates a directory an older manifest names.
  *   2. CRASH RECOVERABILITY — staged-but-uncommitted directories are
  *      invisible (the manifest IS the commit point), and the retain
  *      horizon keeps a superseded version's files readable for in-flight
  *      readers.
  */
class ManifestCommitSpec extends SparkTestBase {
  import spark.implicits._

  private def tagged(tag: Int) = Seq((1L, tag)).toDF("k", "tag")
  private def tagOf(df: org.apache.spark.sql.DataFrame): Int =
    df.select("tag").head().getInt(0)

  test("a reader interleaved between table swaps sees a consistent (base, view) pair") {
    val mc = new ManifestCommit(spark, tmpDir())
    mc.commit(Map("base" -> tagged(1), "view" -> tagged(1)))
    // reader resolves its manifest ONCE (the consistency unit)...
    val snapshot = mc.current()
    // ...and a writer commits the next version between the reader's two
    // table reads — the interleaving that breaks two independent
    // rename-swaps. Both stores flipped in ONE manifest create, so the
    // reader's resolution still names the v1 pair of BOTH tables.
    val baseTag = tagOf(mc.readAt(snapshot, "base"))
    mc.commit(Map("base" -> tagged(2), "view" -> tagged(2)))
    val viewTag = tagOf(mc.readAt(snapshot, "view"))
    assert(baseTag === 1 && viewTag === 1,
      "one manifest resolution must never mix versions across tables")
    // a fresh resolution sees the new pair, again consistently
    val fresh = mc.current()
    assert(tagOf(mc.readAt(fresh, "base")) === 2 &&
      tagOf(mc.readAt(fresh, "view")) === 2)
  }

  test("tables not in a commit carry forward; partial commits stay consistent") {
    val mc = new ManifestCommit(spark, tmpDir())
    mc.commit(Map("base" -> tagged(1), "view" -> tagged(1),
      "marker" -> tagged(1)))
    mc.commit(Map("view" -> tagged(2)))
    val m = mc.current()
    assert(tagOf(mc.readAt(m, "base")) === 1)
    assert(tagOf(mc.readAt(m, "view")) === 2)
    assert(tagOf(mc.readAt(m, "marker")) === 1)
  }

  test("a staged-but-uncommitted directory is invisible to readers (crash before the flip)") {
    val root = tmpDir()
    val mc = new ManifestCommit(spark, root)
    mc.commit(Map("base" -> tagged(1)))
    // simulate a writer that crashed after staging, before the manifest
    // create: the orphan directory exists but no manifest names it
    tagged(99).write.parquet(s"$root/base__v99_deadbeef")
    assert(tagOf(mc.read("base")) === 1,
      "the manifest is the commit point — staged orphans must not surface")
    assert(mc.current()("base").startsWith("base__v1_"))
  }

  test("retain horizon: a just-superseded version stays readable; older versions are GC'd") {
    val root = tmpDir()
    val mc = new ManifestCommit(spark, root, retain = 2)
    mc.commit(Map("base" -> tagged(1), "view" -> tagged(1)))
    val v1 = mc.current()
    mc.commit(Map("view" -> tagged(2)))
    // v1 is one behind: inside the retain horizon, still fully readable
    assert(tagOf(mc.readAt(v1, "base")) === 1 &&
      tagOf(mc.readAt(v1, "view")) === 1)
    mc.commit(Map("view" -> tagged(3)))
    // now v1's view dir is referenced by no retained manifest — GC'd;
    // base__v1 is still named by BOTH retained manifests and must survive
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v1ViewDirs = fs.listStatus(new org.apache.hadoop.fs.Path(root)).toSeq
      .map(_.getPath.getName).filter(_.startsWith("view__v1_"))
    assert(v1ViewDirs.isEmpty,
      "a version no retained manifest references is garbage")
    assert(tagOf(mc.read("base")) === 1 && tagOf(mc.read("view")) === 3)
  }

  test("time travel: a version number pins a full multi-table snapshot; past the retain horizon the versioned read fails loudly") {
    val root = tmpDir()
    val mc = new ManifestCommit(spark, root, retain = 3)
    mc.commit(Map("base" -> tagged(1), "view" -> tagged(1)))
    val v1 = mc.currentVersion().get
    mc.commit(Map("view" -> tagged(2)))
    mc.commit(Map("base" -> tagged(3)))
    // AS OF v1: BOTH tables resolve to their v1 state through one
    // manifestAt — a version is a consistent multi-table snapshot,
    // not per-table history, even after both were superseded
    val snap = mc.manifestAt(v1)
    assert(tagOf(mc.readAt(snap, "base")) === 1 &&
      tagOf(mc.readAt(snap, "view")) === 1,
      "a pinned version must read the state AS OF that commit")
    // current() is unaffected by the pinned read
    assert(tagOf(mc.read("base")) === 3 && tagOf(mc.read("view")) === 2)
    // push v1 past the retain-3 horizon: its manifest file is deleted,
    // so the versioned read fails LOUDLY (file-not-found), never
    // silently resolving newer data — the Delta/Iceberg
    // version-expired contract
    mc.commit(Map("view" -> tagged(4)))
    intercept[java.io.FileNotFoundException] { mc.manifestAt(v1) }
    // versions inside the horizon still travel
    assert(tagOf(mc.readAt(mc.manifestAt(v1 + 1), "view")) === 2)
  }

  test("drop removes tables from the map in the same atomic flip; their directories outlive the flip until the retain horizon") {
    val root = tmpDir()
    val mc = new ManifestCommit(spark, root, retain = 2)
    mc.commit(Map("seg_1" -> tagged(1), "seg_2" -> tagged(2),
      "stats" -> tagged(10)))
    val preDrop = mc.current()
    // the compaction shape: two segments merge into one table and both
    // old names leave the manifest in ONE commit
    mc.commit(Map("seg_merged" -> tagged(3), "stats" -> tagged(11)),
      drop = Set("seg_1", "seg_2"))
    val cur = mc.current()
    assert(!cur.contains("seg_1") && !cur.contains("seg_2"),
      "dropped tables still in the manifest")
    assert(tagOf(mc.readAt(cur, "seg_merged")) === 3 &&
      tagOf(mc.readAt(cur, "stats")) === 11)
    // an in-flight reader holding the PRE-drop resolution still reads
    // the dropped tables (retain horizon covers it)
    assert(tagOf(mc.readAt(preDrop, "seg_1")) === 1 &&
      tagOf(mc.readAt(preDrop, "seg_2")) === 2,
      "retained version lost its dropped tables' directories")
    // two more commits push the dropped dirs past the horizon → GC'd
    mc.commit(Map("stats" -> tagged(12)))
    mc.commit(Map("stats" -> tagged(13)))
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val segDirs = fs.listStatus(new org.apache.hadoop.fs.Path(root)).toSeq
      .map(_.getPath.getName)
      .filter(n => n.startsWith("seg_1__v") || n.startsWith("seg_2__v"))
    assert(segDirs.isEmpty,
      s"dropped tables' directories never collected: $segDirs")
  }

  test("a racing committer fails loudly instead of silently overwriting the winner's manifest") {
    val root = tmpDir()
    val mc = new ManifestCommit(spark, root)
    mc.commit(Map("base" -> tagged(1)))
    val winner = mc.commit(Map("base" -> tagged(2)))
    // the race: a second committer also read currentVersion = 1 and
    // computed the same target version the winner just took — its
    // create-exclusive manifest write must THROW, never tear state or
    // last-writer-win
    intercept[java.io.IOException] {
      mc.commitAs(winner, Map("base" -> tagged(99)))
    }
    assert(tagOf(mc.read("base")) === 2,
      "the winner's state survives the failed race untouched")
  }
}
