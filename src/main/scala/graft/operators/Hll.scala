package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog cardinality sketch (Flajolet et al. 2007), built from
  * engine-portable primitives so the REGISTERS — the sketch state —
  * replay bit-identically in any engine with md5 and integer ops:
  *
  *   h      = first 60 bits of md5(value)        (exact cross-engine)
  *   bucket = h mod 64                           (b = 6 ⇒ m = 64)
  *   w      = h div 64                           (54 payload bits)
  *   rho    = trailing-zero count of w, + 1      (bit trick: length of
  *            bin(w & -w); 55 reserved for w = 0)
  *   register[bucket] = max(rho)
  *
  * Why integers: HLL implementations differ in hash choice and in the
  * estimator's float path, which makes the usual sketches untestable
  * against an independent engine. Here every piece of per-row state is
  * an integer derived from md5, and the harmonic-mean denominator is
  * carried as the INTEGER `sum(2^(55 - register))` (max 64·2^55 < 2^62)
  * — the one float division happens once per group, against the same
  * inlined constant, at the very end.
  *
  * 100 TB shape: the sketch is why you'd use this over exact distinct —
  * `registers` partial-aggregates map-side down to ≤ m rows per group
  * per partition, so the one shuffle carries (groups × 64) tiny rows
  * regardless of corpus size, where exact distinct shuffles every
  * distinct value. Sketches from disjoint loads merge by register max,
  * so incremental corpora union for free.
  */
object Hll {

  /** m = 64 buckets (b = 6). Small enough that registers are auditable
    * by eye and the full grid rides any battery output; the standard
    * error at m = 64 is ~13% — the spec checks the estimator inside it. */
  val NumBuckets = 64

  /** rho for an all-zero payload (54 payload bits ⇒ real rho ≤ 54). */
  val ZeroRho = 55

  /** alpha_64 · m² · 2^55 · 1e6 — the estimator numerator, micro-scaled;
    * computed once here and INLINED as the same shortest-roundtrip
    * double literal in Spark and oracle SQL so both engines divide the
    * identical IEEE constant by the identical integer denominator. */
  val EstimatorNumeratorMicro: Double =
    1000000.0 * 0.709 * 4096.0 * 36028797018963968.0

  /** 60-bit integer hash both engines compute identically. */
  private def h60(value: Column): Column =
    conv(substring(md5(value), 1, 15), 16, 10).cast("long")

  /** Per-(group, bucket) max-rho registers. Only observed buckets get a
    * row (absent bucket = register 0, restored by [[indicator]]). */
  def registers(
      df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame = {
    val h = h60(col(valueCol))
    // h div 64 as a bit shift: Column `/` is DOUBLE division, which
    // would lose bits above 2^53 of the 60-bit hash
    val w = shiftright(h, 6)
    val rho = when(w === 0L, lit(ZeroRho))
      .otherwise(length(bin(w.bitwiseAND(-w))))
    df.na.drop(Seq(valueCol))
      .withColumn("bucket", pmod(h, lit(64L)).cast("int"))
      .withColumn("__rho", rho)
      .groupBy((groupCols.map(col) :+ col("bucket")): _*)
      .agg(max(col("__rho")).cast("int").as("register"))
  }

  /** Merge sketches down to a coarser grouping by register MAX — the HLL
    * merge law: sketch(A ∪ B) = elementwise-max(sketch(A), sketch(B)).
    * This is what lets per-load / per-partition sketches union into a
    * corpus sketch without rescanning anything: at 100 TB, daily loads
    * keep their own ≤ 64-row sketches and any ad-hoc union (per source,
    * per month, global) is an aggregate over a few hundred tiny rows.
    * Pass the subset of grouping columns to keep (empty = one global
    * sketch). */
  def merge(regs: DataFrame, groupCols: Seq[String]): DataFrame =
    regs.groupBy((groupCols.map(col) :+ col("bucket")): _*)
      .agg(max(col("register")).cast("int").as("register"))

  /** Integer harmonic-mean denominator per group:
    * `sum over all 64 buckets of 2^(55 - register)` — observed buckets
    * contribute via the power table, absent ones contribute 2^55 each.
    * From it the classic estimate is
    * `alpha·m²/Z` with `Z = indicator / 2^55`. */
  def indicator(regs: DataFrame, groupCols: Seq[String]): DataFrame = {
    // 2^(55 - r): r in 1..55 ⇒ exponent 0..54 — the Bloom power table
    val pow = element_at(lit(BloomBits.Pow2), lit(56) - col("register"))
    regs.groupBy(groupCols.map(col): _*)
      .agg(
        (sum(pow) +
          (lit(64L) - count(lit(1))) * lit(1L << ZeroRho))
          .as("hll_indicator"),
        count(lit(1)).cast("int").as("n_buckets_hit"))
  }

  /** Micro-scaled raw HLL estimate from the integer indicator — the one
    * float step, identical on any engine that parses the same double
    * literal and divides once. */
  def estimateMicro(ind: Column): Column =
    round(lit(EstimatorNumeratorMicro) / ind.cast("double")).cast("long")
}
