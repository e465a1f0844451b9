package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Local scale-up generator for the sfN scaling spot-check (BASELINE.md):
  * replicates a driver-provided sf directory `factor`× with key-space
  * shifting, so plan wall-times can be measured one decade above the
  * bench SF without touching the read-only driver data.
  *
  * Construction, chosen so every query family scales LINEARLY in rows —
  * the property the spot-check wants to FALSIFY in the plans, so the
  * generator must not create it or destroy it artificially:
  *  - Fixed dims (region, nation) copy once — they don't scale with data.
  *  - Every scaling table's keys shift by `replica * 10^12` (key spaces
  *    are far below 10^12), consistently on both sides of each FK
  *    (orders.o_custkey and customer.c_custkey shift together, etc.), so
  *    join fan-outs per key are EXACTLY the originals.
  *  - documents: replica 0 is verbatim; replica i rotates the lowercase
  *    alphabet by i positions (`translate`) — a LENGTH-PRESERVING
  *    renaming, so `factor`× the docs is exactly `factor`× the bytes
  *    (the first cut of this generator suffixed `_ri` per token, which
  *    inflated replica text ~1.5× and made every linear-in-chars text
  *    plan read as exponent ~1.17 against the 10× doc-count decade).
  *    Within a replica, pairwise similarity structure is bit-identical
  *    to the original corpus (same shingle relationships under a renamed
  *    alphabet); across replicas the rotations differ mod 26, every
  *    token contains letters (driver corpus is lowercase word salad), so
  *    all shingles differ, Jaccard/containment are 0, and dedup pair
  *    counts scale by `factor`, not `factor²` — the corpus behaves as
  *    `factor` independent shards, which is what a 10× bigger real crawl
  *    looks like to these operators (dup rate is scale-free, not
  *    quadratic).
  *  - embeddings: vectors copy with shifted ids — the vector
  *    distribution (hence k-means geometry, inverted-list occupancy
  *    ratios, ADC cost per probe) is unchanged while N grows 10×.
  *  - events: event/user ids shift per replica — 10× users, per-user
  *    history shapes unchanged (funnel/session/window state per key
  *    constant, number of keys scales).
  *
  * Usage: ScaleGen <srcSfDir> <dstDir> <factor>
  */
object ScaleGen {

  private val Stride = 1000000000000L

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val factor = args(2).toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, src, dst, factor)
    spark.stop()
  }

  def generate(spark: SparkSession, src: String, dst: String,
      factor: Int): Unit = {
    require(factor <= 26,
      "documents replicas are distinguished by alphabet rotation (26 max)")
    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$dst/$t.parquet")

    // fixed dims: verbatim
    Seq("region", "nation").foreach(t => write(read(t), t))

    def replicate(t: String, keyShifts: Seq[String],
        perReplica: (DataFrame, Int) => DataFrame = (df, _) => df): Unit = {
      val base = read(t)
      val parts = (0 until factor).map { i =>
        val shifted = keyShifts.foldLeft(perReplica(base, i)) { (df, k) =>
          df.withColumn(k, col(k) + lit(i * Stride))
        }
        shifted
      }
      write(parts.reduce(_ unionByName _), t)
    }

    replicate("customer", Seq("c_custkey"))
    replicate("supplier", Seq("s_suppkey"))
    replicate("part", Seq("p_partkey"))
    replicate("orders", Seq("o_orderkey", "o_custkey"))
    replicate("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))
    replicate("events", Seq("event_id", "user_id"))
    replicate("embeddings", Seq("vec_id"))
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    replicate("documents", Seq("doc_id"), (df, i) =>
      if (i == 0) df
      else {
        val rot = alpha.drop(i % 26) + alpha.take(i % 26)
        df.withColumn("text", translate(col("text"), alpha, rot))
      })
  }

  /** Per-language SYLLABLE inventories for [[multilingualDocs]] — five
    * genuinely distinct character distributions (the driver corpus is
    * one shared vocabulary, so t28/t03's gated accuracy there is chance
    * by construction, documented at the gate). Latin languages share an
    * alphabet but not n-gram statistics (the real langid regime);
    * zh is script-distinct (CJK codepoints).
    */
  private val syllables: Seq[(String, IndexedSeq[String])] = Seq(
    "en" -> Vector("the", "and", "ing", "ion", "ent", "her", "for",
      "tha", "ver", "int", "wh", "ou", "ght", "st"),
    "es" -> Vector("cion", "ando", "ente", "ar", "os", "la", "que",
      "ado", "mente", "illo", "ue", "nos", "ras", "del"),
    "fr" -> Vector("eau", "oux", "tion", "ment", "les", "de", "que",
      "ais", "eur", "oir", "ons", "aient", "eux", "çon"),
    "de" -> Vector("sch", "ung", "ein", "ich", "der", "und", "chen",
      "ber", "gen", "eit", "auf", "tz", "pf", "zw"),
    "zh" -> Vector("的", "是", "在", "了", "和", "有", "人", "这",
      "中", "大", "为", "上", "个", "国"))

  /** Deterministic multilingual corpus with per-language CHARACTER
    * distributions: (doc_id, lang, text), lang round-robin over the five
    * [[syllables]] languages, each doc ~40 words of 1–3 syllables drawn
    * by a hash of (lang, doc, word, slot) — no RNG state, so the fixture
    * is bit-identical across runs and JVMs. This is the fixture that
    * makes a held-out langid accuracy MEANINGFUL (the driver corpus
    * cannot): trigram profiles trained on doc_id%5≠4 separate these
    * distributions, and the floor is pinned by
    * PipelineOpsSpec ("t28 on the ScaleGen multilingual fixture").
    * Generation is distributed (one map over spark.range — scales to
    * any nDocs like the rest of ScaleGen).
    */
  def multilingualDocs(spark: SparkSession, nDocs: Int): DataFrame = {
    import spark.implicits._
    val inv = syllables
    spark.range(nDocs).as[Long].mapPartitions { it =>
      it.map { id =>
        // lang keys on id/5, NOT id: t28's holdout is doc_id % 5 = 4,
        // so an id-mod assignment would put one whole language in the
        // held-out slice and none of it in training
        val (lang, syl) = inv(((id / 5) % inv.size).toInt)
        def pick(w: Int, k: Int): String = {
          val h = scala.util.hashing.MurmurHash3
            .stringHash(s"$lang|$id|$w|$k")
          syl(math.floorMod(h, syl.size))
        }
        val words = (0 until 40).map { w =>
          val n = 1 + math.floorMod(scala.util.hashing.MurmurHash3
            .stringHash(s"len|$lang|$id|$w"), 3)
          (0 until n).map(k => pick(w, k)).mkString
        }
        (id, lang, words.mkString(" "))
      }
    }.toDF("doc_id", "lang", "text")
  }
}
