package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A Bloom-filter bit set built from a key column, probed by a pure
  * codegen'd column expression — membership prefiltering without a UDF
  * and without shipping the key set itself.
  *
  * Why this exists at 100 TB: the broadcast set-join used by exact
  * membership checks ([[Curation.contaminationStats]],
  * [[graft.store.FingerprintIndex]]) ships every key to every executor.
  * When the reference side grows to tens of millions of keys (a large
  * eval suite, a previous crawl's fingerprints), the broadcast is GBs;
  * the Bloom filter for the same set at 10 bits/key is ~1% of that, and
  * the probe is three integer hashes + three bit tests per row — fully
  * inside whole-stage codegen. Bloom filters have NO false negatives,
  * so a prefilter that keeps only might-contain rows, followed by an
  * exact confirm join on the (now tiny) survivor set, returns exactly
  * the set-join's answer while the plan's expensive leg scans 100× less.
  *
  * Determinism: bit positions are `xxhash64(key, seed_i) mod numBits` —
  * a pure function of (key, numBits, numHashes), so retries and
  * incremental loads probe identically. `numBits` is derived from the
  * key count rounded up to whole 64-bit words, never from sampling.
  *
  * The words array rides the plan as ONE array literal (`lit`), not a
  * broadcast variable: at 10 bits/key a 1M-key filter is ~156k longs
  * (1.25 MB) — well inside plan-size budgets, and visible to every
  * expression without a distributed-cache round trip.
  */
final case class BloomBits(numBits: Int, numHashes: Int, words: Array[Long]) {

  /** true iff every probe bit of `key` is set — the no-false-negative
    * membership test. Codegen-friendly: k × (xxhash64, pmod, shift,
    * bitwise-and) over a literal array. */
  def mightContain(key: Column): Column =
    if (numBits == 0) lit(false)
    else {
      // ONE words literal shared by all probes (r18): `lit(words)` per
      // probe converted the bit array to Catalyst form numHashes times
      // and embedded numHashes distinct Literal copies in the plan —
      // same data, k× the plan weight and conversion work
      val wordsLit = lit(words)
      val pow2Lit = lit(BloomBits.Pow2)
      (0 until numHashes).map { i =>
        val pos = pmod(xxhash64(key, lit(i)), lit(numBits.toLong))
        val word = element_at(wordsLit, (pos / 64).cast("int") + lit(1))
        // 1L << (pos % 64) via a 64-entry power-of-two literal: the
        // Scala `shiftleft` helper only takes a constant shift amount
        val mask = element_at(pow2Lit,
          pmod(pos, lit(64L)).cast("int") + lit(1))
        word.bitwiseAND(mask) =!= lit(0L)
      }.reduce(_ && _)
    }

  /** Bits set / total — the load factor driving the false-positive
    * rate ((set/total)^k). */
  def loadFactor: Double =
    if (numBits == 0) 0.0
    else words.map(java.lang.Long.bitCount(_).toLong).sum.toDouble / numBits
}

object BloomBits {
  /** 1L << i for i in 0..63 (index 64 is Long.MinValue — the sign bit). */
  private[operators] val Pow2: Array[Long] =
    (0 until 64).map(i => 1L << i).toArray
}

object Bloom {

  /** Build the filter from the DISTINCT values of `keys(keyCol)`.
    *
    * Shape: one distributed pass computes each key's `numHashes` bit
    * positions and ships only the DISTINCT positions to the driver —
    * at most `numBits` ints regardless of key count, partial-aggregated
    * map-side. The key strings themselves never leave the executors.
    * Sized at `bitsPerKey` (default 10 ⇒ ~1% false positives with 3
    * hashes); an empty key set yields the always-false filter.
    */
  def build(
      keys: DataFrame,
      keyCol: String,
      bitsPerKey: Int = 10,
      numHashes: Int = 3): BloomBits = {
    // persisted across the two build actions (count sizes the filter,
    // positions fill it) so the key derivation — often an n-gram
    // explode over the reference corpus — runs once, not twice
    val distinctKeys = keys.select(col(keyCol)).na.drop().distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try fill(distinctKeys, keyCol, distinctKeys.count(), bitsPerKey,
      numHashes)
    finally distinctKeys.unpersist(false)
  }

  /** [[build]] when the caller already knows the distinct-key count
    * (it rode an earlier aggregation — the incremental indexes count
    * per-bucket keys for their ratio gates anyway): skips the sizing
    * count action, ONE Spark job instead of two. `n` must be the exact
    * non-null distinct count of `keyCol`; a wrong `n` only mis-sizes
    * the filter (bits wasted or a higher false-positive rate), never
    * its no-false-negative contract. */
  def buildWithKnownCount(
      keys: DataFrame,
      keyCol: String,
      n: Long,
      bitsPerKey: Int = 10,
      numHashes: Int = 3,
      assumeDistinct: Boolean = false): BloomBits =
    // assumeDistinct skips the defensive dedup exchange when the caller
    // hands an already-distinct non-null key frame (e.g. a pinned
    // `.distinct()` — contaminationStatsBloom): duplicate or null keys
    // under the flag never break the no-false-negative contract (the
    // positions pass distincts and na-drops nothing — nulls hash), they
    // only waste position-derivation work, so the flag is a pure
    // plan-shape promise
    fill(if (assumeDistinct) keys.select(col(keyCol))
      else keys.select(col(keyCol)).na.drop().distinct(),
      keyCol, n, bitsPerKey, numHashes)

  private def fill(distinctKeys: DataFrame, keyCol: String, n: Long,
      bitsPerKey: Int, numHashes: Int): BloomBits = {
    require(bitsPerKey >= 1, s"bitsPerKey must be >= 1, got $bitsPerKey")
    require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")
    if (n == 0L) return BloomBits(0, numHashes, Array.empty)
    val numBits = math.toIntExact(((n * bitsPerKey + 63L) / 64L) * 64L)
    val positions = distinctKeys
      .select(explode(array((0 until numHashes).map(i =>
        pmod(xxhash64(col(keyCol), lit(i)), lit(numBits.toLong))
          .cast("int")): _*)).as("pos"))
      .distinct()
      .collect().map(_.getInt(0))
    val words = new Array[Long](numBits / 64)
    positions.foreach(p => words(p >>> 6) |= 1L << (p & 63))
    BloomBits(numBits, numHashes, words)
  }
}
