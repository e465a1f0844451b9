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
}
