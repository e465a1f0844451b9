package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for large-×-large joins on hot keys.
  *
  * When one join key holds a disproportionate share of the fact rows, the
  * shuffle sends that key's entire volume to a single reducer and the
  * stage runs at the speed of its slowest task. AQE's skew-join split
  * (`spark.sql.adaptive.skewJoin`) handles this at runtime for sort-merge
  * joins; explicit salting is the plan-level alternative that also works
  * where AQE can't see the skew (e.g. a key that is hot only after an
  * upstream filter, or non-SMJ plans).
  *
  * `saltedJoin` is semantics-preserving: the dimension side is replicated
  * `salts` times (once per salt value), the fact side gets a uniform salt
  * — a deterministic hash of the per-row monotonic id alone; the key need
  * not participate because the dim side replicates across every salt —
  * and the join runs on (key, salt), spreading each hot key across
  * `salts` reducers. The result equals the unsalted join exactly (proven
  * by the q30 oracle and SkewSpec).
  */
object Skew {

  /** Inner equi-join of `fact` and `dim` on `key`, with the fact side of
    * each key spread across `salts` partitions. `dim` is replicated
    * `salts`×, so keep it the smaller input (but too large / too skewed to
    * broadcast — else just broadcast it).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts > 0)
    // uniform, deterministic salt: row-content hash mod salts (abs-safe)
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)).cast("int"))
    val saltedDim = dim.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }
}
