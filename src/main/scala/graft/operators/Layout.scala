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

  /** The 2-D Hilbert key of two non-negative dimension columns using
    * the low `bits` bits of each — a native codegen'd expression (the
    * per-level rotation is data-dependent, so unlike Morton there is no
    * shift/mask cascade; an unrolled column spelling would grow ~3× per
    * level). Hilbert improves on Z-order's locality: consecutive keys
    * are always ADJACENT grid cells (no Morton "jumps" across the
    * keyspace), so range-clustered files get strictly tighter per-file
    * min-max spans on both dimensions — see LayoutSpec's head-to-head.
    * Same skew note as [[zorderKey2]]: feed bucketed ranks for skewed
    * domains. */
  def hilbertKey2(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= MaxBits, s"bits in [1, $MaxBits], got $bits")
    graft.functions.functions.hilbertKey(x, y, bits)
  }

  /** [[clusterByZOrder]]'s Hilbert twin. */
  def clusterByHilbert(
      df: DataFrame, xCol: String, yCol: String,
      numPartitions: Int, bits: Int = 16): DataFrame = {
    require(numPartitions >= 1, s"numPartitions >= 1, got $numPartitions")
    require(!df.columns.contains("hkey"),
      "input column 'hkey' collides with the hkey output column")
    df.withColumn("hkey", hilbertKey2(col(xCol), col(yCol), bits))
      .repartitionByRange(numPartitions, col("hkey"))
      .sortWithinPartitions(col("hkey"))
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

/** The 2-D Hilbert curve transform (Wikipedia "Hilbert curve" xy2d/d2xy,
  * the Skilling-style per-level rotate) as plain Long math — called by
  * the native expression's eval AND its generated code (the
  * [[graft.core.Blake2b]] static-forwarder pattern), and mirrored
  * level-by-level by the battery's DuckDB oracle SQL (generated from
  * [[levels]] — one source of truth for the level order on both
  * engines).
  */
object HilbertCurve {

  /** Per-level side lengths for a `bits`-bit curve, high to low:
    * 2^(bits-1), …, 2, 1. The oracle SQL generator iterates this same
    * list. */
  def levels(bits: Int): Seq[Long] =
    (bits - 1 to 0 by -1).map(1L << _)

  /** Distance along the `bits`-bit Hilbert curve of grid cell (x, y);
    * inputs are masked to `bits` bits. */
  def xy2d(bits: Int, x0: Long, y0: Long): Long = {
    val mask = (1L << bits) - 1
    var x = x0 & mask
    var y = y0 & mask
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      // rotate the quadrant so the sub-curve orients correctly
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      x &= (s - 1)
      y &= (s - 1)
      s >>= 1
    }
    d
  }

  /** Inverse: the grid cell at distance `d` (packed as x << 32 | y —
    * one Long so the spec can round-trip without tuples in codegen). */
  def d2xy(bits: Int, d0: Long): Long = {
    var x = 0L
    var y = 0L
    var t = d0
    var s = 1L
    while (s < (1L << bits)) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    (x << 32) | y
  }
}
