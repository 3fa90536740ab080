package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional storage layout: Z-order (Morton) clustering keys.
  *
  * A 100 TB table sorted on one column prunes scans on that column only;
  * interleaving the bits of two (or more) key columns into one Z-order
  * key and range-clustering on it keeps BOTH dimensions' value ranges
  * narrow inside every file/row-group, so min-max statistics prune scans
  * filtered on either dimension — the layout trick behind Delta/Iceberg
  * `ZORDER BY` and the classic UB-tree literature.
  *
  * Everything here is plain column arithmetic (shifts/masks on BIGINT,
  * fully codegen'd, map-side): computing layout keys for 100 TB is one
  * pass with no shuffle; the single shuffle belongs to the subsequent
  * `repartitionByRange` that realizes the clustering before a write.
  */
object Layout {

  /** Max bits per dimension for a 2-D interleave: 2×31 = 62 < 64. */
  private val MaxBits = 31

  /** The mask-shift cascade spreading bit i to position 2i, as
    * (shift, mask) steps — shared with the battery's DuckDB oracle SQL
    * (generated from this list) so both engines compute from one source
    * of truth. */
  private[graft] val SpreadSteps: Seq[(Int, Long)] = Seq(
    16 -> 0x0000FFFF0000FFFFL,
    8 -> 0x00FF00FF00FF00FFL,
    4 -> 0x0F0F0F0F0F0F0F0FL,
    2 -> 0x3333333333333333L,
    1 -> 0x5555555555555555L)

  /** Spread the low `bits` bits of `c`: bit i moves to position 2i
    * (the textbook cascade, 5 steps instead of a per-bit loop). Input
    * must already be masked to `bits` bits. */
  private def spread(c: Column): Column =
    SpreadSteps.foldLeft(c) { case (x, (sh, mask)) =>
      x.bitwiseOR(shiftleft(x, sh)).bitwiseAND(lit(mask))
    }

  /** Generated (shift, mask) cascade for spreading `bits` source bits
    * with stride `n` (bit i of the input lands at position n·i): at each
    * step the bits sit in groups of `s` consecutive source bits whose
    * group g starts at position n·s·g; the step `x | (x << (n-1)·s)`
    * then masks halves the group size. For n = 2 this generates exactly
    * [[SpreadSteps]]; for n = 3 it reproduces the textbook 3-D Morton
    * masks (…9249249, …c30c30c3, …). Shared with the oracle-SQL
    * generator so both engines fold over one step list. */
  private[graft] def spreadStepsN(n: Int, bits: Int): Seq[(Int, Long)] = {
    require(n >= 1 && bits >= 1 && n.toLong * bits <= 63,
      s"need n*bits <= 63 (sign bit clear), got n=$n bits=$bits")
    // descending powers of two below `bits`; a step with s >= bits is a
    // structural no-op (all source bits already fit one group)
    val sizes = Iterator.iterate(1)(_ * 2).takeWhile(_ < bits).toSeq.reverse
    sizes.map { s =>
      var mask = 0L
      var pos = 0
      while (pos < 64) {
        val width = math.min(s, 64 - pos)
        mask |= ((1L << width) - 1) << pos
        pos += n * s
      }
      ((n - 1) * s, mask)
    }
  }

  /** The Z-order key of `cols.size` non-negative dimension columns using
    * the low `bits` bits of each: bit i of dimension d lands at position
    * n·i + d. Bit budget: n·bits ≤ 63 (sign bit stays clear), so e.g.
    * 3 dims get ≤ 21 bits each, 4 dims ≤ 15 — callers bucket or rank
    * wider domains down first, same as [[zorderKey2]]. Pure codegen'd
    * BIGINT shift/mask math, map-side, no shuffle. */
  def zorderKeyN(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 1, "zorderKeyN needs at least one dimension column")
    require(bits >= 1 && n.toLong * bits <= 63,
      s"bit budget n*bits <= 63 exceeded: $n dims x $bits bits")
    val steps = spreadStepsN(n, bits)
    val inMask = (1L << bits) - 1
    cols.zipWithIndex.map { case (c, d) =>
      val sp = steps.foldLeft(c.cast("long").bitwiseAND(lit(inMask))) {
        case (x, (sh, m)) =>
          x.bitwiseOR(shiftleft(x, sh)).bitwiseAND(lit(m))
      }
      if (d == 0) sp else shiftleft(sp, d)
    }.reduce(_ bitwiseOR _)
  }

  /** The Z-order key of two non-negative dimension columns, using the
    * low `bits` bits of each (callers bucket/rank wider domains down
    * first — for skewed or unbounded domains, rank-then-interleave is
    * the robust spelling, see [[clusterByZOrder]]'s note). Bit i of `x`
    * lands at position 2i, bit i of `y` at 2i+1. */
  def zorderKey2(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= MaxBits, s"bits in [1, $MaxBits], got $bits")
    val mask = (1L << bits) - 1
    val xs = spread(x.cast("long").bitwiseAND(lit(mask)))
    val ys = spread(y.cast("long").bitwiseAND(lit(mask)))
    xs.bitwiseOR(shiftleft(ys, 1))
  }

  /** Cluster `df` for writing: range-partition on the Z-order key of
    * (`xCol`, `yCol`) into `numPartitions` output files, sorted within
    * each partition so row-group min-max stats stay tight. The returned
    * frame carries a `zkey` column (callers drop it after the write if
    * the layout is not meant to be queryable).
    *
    * Skew note: raw-value interleave assumes both dimensions are
    * roughly uniform over their masked domains (ids, hashes, bucketed
    * timestamps). For skewed domains, feed pre-bucketed ranks —
    * `ntile` or quantile bucket ids — as `xCol`/`yCol`.
    */
  def clusterByZOrder(
      df: DataFrame, xCol: String, yCol: String,
      numPartitions: Int, bits: Int = 16): DataFrame = {
    require(numPartitions >= 1, s"numPartitions >= 1, got $numPartitions")
    require(!df.columns.contains("zkey"),
      "input column 'zkey' collides with the zkey output column")
    df.withColumn("zkey", zorderKey2(col(xCol), col(yCol), bits))
      .repartitionByRange(numPartitions, col("zkey"))
      .sortWithinPartitions(col("zkey"))
  }

  /** N-dimensional [[clusterByZOrder]]: range-partition + sort on the
    * interleaved key of all `cols`. Same skew note applies — feed
    * pre-bucketed ranks for skewed domains. */
  def clusterByZOrderN(
      df: DataFrame, cols: Seq[String],
      numPartitions: Int, bits: Int): DataFrame = {
    require(numPartitions >= 1, s"numPartitions >= 1, got $numPartitions")
    require(!df.columns.contains("zkey"),
      "input column 'zkey' collides with the zkey output column")
    df.withColumn("zkey", zorderKeyN(cols.map(col), bits))
      .repartitionByRange(numPartitions, col("zkey"))
      .sortWithinPartitions(col("zkey"))
  }
}
