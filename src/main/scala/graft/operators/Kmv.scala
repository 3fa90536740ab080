package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct sketch operators over the native
  * [[graft.functions.KmvAgg]] aggregate — the third sketch family next
  * to [[Hll]] (distinct counts) and [[Cms]] (frequencies), carried for
  * the one thing the other two cannot do: SET-OPERATION estimates
  * between groups (Jaccard, intersection size) from already-built
  * sketches.
  *
  * The engine-portable hash discipline is shared with Hll/Cms: values
  * hash through the first 60 bits of md5, so the sketch STATE (the k
  * smallest distinct hashes) is an exact integer set both engines
  * derive identically — what makes a sketch oracle-checkable at all.
  *
  * 100 TB shape: the aggregate's partial state is ≤ k longs per group
  * per partition and partial-aggregates map-side, so the one shuffle
  * carries ≤ groups × k longs at any corpus size; pairwise set
  * estimates then run over k-element arrays (array expressions on
  * already-tiny data), never touching the corpus again. Sketches merge
  * by k-min of the union ([[mergeSketches]]), so per-load sketches
  * union for free like the other two families.
  */
object Kmv {

  /** k = 64: relative error ~ 1/sqrt(k−1) ≈ 13% (the [[Hll.NumBuckets]]
    * sizing argument — small enough to audit, spec checks the regime). */
  val DefaultK = 64

  /** Hash space size as a double: 2^60, the exclusive upper bound of
    * [[h60]] — inlined identically in Spark and oracle SQL so the one
    * float division divides the same IEEE constant. */
  val HashSpace: Double = 1152921504606846976.0

  /** 60-bit integer hash both engines compute identically. */
  def h60(value: Column): Column =
    conv(substring(md5(value), 1, 15), 16, 10).cast("long")

  /** Per-group sketch: (groupCols*, kmv array<bigint>). */
  def sketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int = DefaultK): DataFrame =
    df.na.drop(Seq(valueCol))
      .groupBy(groupCols.map(col): _*)
      .agg(graft.functions.functions
        .kmvSketch(h60(col(valueCol)), k).as("kmv"))

  /** Merge two sketch arrays: the k smallest of the distinct union —
    * the KMV merge law (array expressions; sketches are ≤ k elements). */
  def mergeSketches(a: Column, b: Column, k: Int = DefaultK): Column =
    slice(array_sort(array_distinct(concat(a, b))), 1, k)

  /** Micro-scaled distinct-count estimate from a sketch built with `k`:
    * exact size when the sketch is not full (fewer than k distinct
    * values existed — the estimator's exact regime), else the classic
    * (k−1) · M / kth-minimum. One float division against the inlined
    * [[HashSpace]] constant, micro-rounded — the [[Hll.estimateMicro]]
    * discipline. */
  def estimateMicro(kmv: Column, k: Int = DefaultK): Column =
    when(size(kmv) < k, size(kmv).cast("long") * 1000000L)
      .otherwise(
        round(lit(1000000.0) * (k - 1) * lit(HashSpace) /
          element_at(kmv, k).cast("double")).cast("long"))

  /** Jaccard numerator between two sketches: how many of the union's
    * k minima appear in BOTH sides — an exact integer from the two
    * k-element arrays; J ≈ this / min(k, |union sketch|). With it,
    * |A ∩ B| ≈ J · |A ∪ B| — the set-intersection estimate HLL's
    * register-max merge cannot produce. */
  def jaccardHits(a: Column, b: Column, k: Int = DefaultK): Column =
    size(array_intersect(array_intersect(mergeSketches(a, b, k), a), b))
}
