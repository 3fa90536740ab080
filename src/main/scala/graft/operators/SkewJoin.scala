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
    * Seq(key))` row-for-row.
    *
    * The salt is derived deterministically from the big side's row
    * content (xxhash64 over all columns), never from
    * `monotonically_increasing_id()`: a nondeterministic salt used as a
    * shuffle key means a recomputed map task re-salts its rows into
    * different reduce partitions after a fetch failure, double-counting
    * or dropping rows (the SPARK-23207 class of bug). Identical rows
    * share a salt, which is harmless — they carry identical payloads to
    * the same task, skew only reappears if the hot key's rows are near
    * copies of one row. */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      saltFactor: Int = 8): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(saltFactor))
        .cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
