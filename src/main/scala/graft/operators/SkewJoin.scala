package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted join for skewed keys: when one key dominates (the reference's
  * hot-key concern, README.md:189-202, generalized to joins), a plain
  * shuffle join sends the whole hot key to one task. Salting splits each
  * big-side key into `saltFactor` sub-keys and replicates the small side
  * across all salts, so the hot key fans out over `saltFactor` tasks.
  *
  * AQE's skew-join handles this automatically for sort-merge joins; the
  * explicit operator covers the cases AQE cannot see (aggregations after
  * the join, non-AQE paths) and documents the pattern.
  */
object SkewJoin {

  /** Inner-join `big` with `small` on `key`, spreading each big-side key
    * over `saltFactor` partitions. Result equals `big.join(small,
    * Seq(key))` row-for-row. */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      saltFactor: Int = 8): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor))
        .cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
