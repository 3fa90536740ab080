package graft.core

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData

/** The tight-loop argmin behind
  * [[graft.functions.NearestCentroidsExpr]] (the static-forwarder
  * pattern shared with [[Blake2b]]/[[TextNorm]]: one implementation
  * serves both interpreted eval and generated code).
  *
  * Arithmetic contract — every step spells exactly what the SQL
  * expression it replaced computed, so trained models, battery oracles,
  * and persisted CellIndex assignments are bit-identical across the
  * swap:
  *   - dot products accumulate ascending by index (the
  *     [[graft.functions.DotProductExpr]] loop);
  *   - squared distance is `(vv - 2.0*vc) + cc` in that association
  *     order (the `vectorDot(v,v) - 2*vectorDot(v,c) +
  *     vectorDot(c,c)` column spelling);
  *   - micro-rounding is Spark's `round(x)` on DOUBLE — decimal-string
  *     BigDecimal HALF_UP (an FP `floor(x+0.5)` differs on values like
  *     0.49999999999999994 where the +0.5 itself rounds) — then the
  *     non-ANSI `CAST(double AS BIGINT)` truncation;
  *   - ties take the centroid EARLIEST in the given order; callers
  *     pre-sort centroids ascending by cluster id, reproducing
  *     `array_min`'s (d, cl) struct ordering;
  *   - a null / wrong-length / null-element vector yields
  *     `(null, ids(0))` — exactly the `(null d, min cl)` struct the
  *     old nulls-first `array_min` produced, so unroutable-vector
  *     filters (`__a.d IS NOT NULL`) behave identically.
  */
object Centroids {

  /** Spark `round(double)` + `CAST(double AS BIGINT)`. */
  def roundMicroToLong(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP)
      .doubleValue().toLong

  /** Argmin row `(d: java.lang.Long, cl: ids(best))` of the
    * micro-BIGINT squared distance from `v` to each of `cents`
    * (uniform-length, pre-sorted by cluster id); `cc(i)` is the
    * precomputed self-dot of `cents(i)` (same ascending
    * accumulation). */
  def nearest(v: ArrayData, cents: Array[Array[Double]],
      cc: Array[Double], checkNulls: Boolean,
      ids: Array[AnyRef]): InternalRow = {
    val dim = cents(0).length
    if (v == null || v.numElements() != dim)
      return new GenericInternalRow(Array[Any](null, ids(0)))
    var vv = 0.0d
    var i = 0
    while (i < dim) {
      if (checkNulls && v.isNullAt(i))
        return new GenericInternalRow(Array[Any](null, ids(0)))
      val x = v.getDouble(i)
      vv += x * x
      i += 1
    }
    var bestD = 0L
    var bestIdx = -1
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      var vc = 0.0d
      i = 0
      while (i < dim) {
        vc += v.getDouble(i) * cent(i)
        i += 1
      }
      val d = roundMicroToLong((vv - 2.0d * vc + cc(c)) * 1000000.0d)
      if (bestIdx < 0 || d < bestD) {
        bestD = d
        bestIdx = c
      }
      c += 1
    }
    new GenericInternalRow(Array[Any](bestD, ids(bestIdx)))
  }

  /** `cc` self-dots for [[nearest]], accumulated exactly like the
    * per-row dots. */
  def selfDots(cents: Array[Array[Double]]): Array[Double] =
    cents.map { cent =>
      var s = 0.0d
      var i = 0
      while (i < cent.length) {
        s += cent(i) * cent(i)
        i += 1
      }
      s
    }
}
