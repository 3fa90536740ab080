package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSuite {

  /** Reference interleave: bit i of x → 2i, bit i of y → 2i+1. */
  private def morton(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    for (i <- 0 until bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("zorderKey2 matches the per-bit reference on exhaustive 6-bit + " +
    "random 16/31-bit inputs") {
    import spark.implicits._
    val small = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val rnd = new scala.util.Random(42)
    def draw(bound: Long) = math.floorMod(rnd.nextLong(), bound)
    val wide = Seq.fill(200)((draw(1L << 16), draw(1L << 16)))
    val huge = Seq.fill(200)((draw(1L << 31), draw(1L << 31)))
    for ((pairs, bits) <- Seq((small, 6), (wide, 16), (huge, 31))) {
      val got = pairs.toDF("x", "y")
        .select($"x", $"y", Layout.zorderKey2($"x", $"y", bits).as("z"))
        .collect()
      got.foreach { r =>
        val (x, y, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
        assert(z === morton(x, y, bits), s"x=$x y=$y bits=$bits")
      }
    }
  }

  /** Reference N-dim interleave: bit i of dim d → N·i + d. */
  private def mortonN(xs: Seq[Long], bits: Int): Long = {
    var z = 0L
    val n = xs.size
    for (d <- 0 until n; i <- 0 until bits)
      z |= ((xs(d) >> i) & 1L) << (n * i + d)
    z
  }

  test("zorderKeyN matches the per-bit reference exhaustively for " +
    "n=1..4 at 3 bits, and on random wide inputs at the bit budget") {
    import spark.implicits._
    for (n <- 1 to 4) {
      // exhaustive: all 8^n coordinate tuples over a 3-bit domain
      val tuples = Seq.fill(n)(0L until 8L)
        .foldLeft(Seq(Seq.empty[Long]))((acc, r) =>
          acc.flatMap(t => r.map(v => t :+ v)))
      val df = tuples.map(t => Tuple1(t)).toDF("dims")
      val cols = (0 until n).map(d => $"dims".getItem(d))
      val got = df.select($"dims", Layout.zorderKeyN(cols, 3).as("z"))
        .collect()
      got.foreach { r =>
        val xs = r.getSeq[Long](0)
        assert(r.getLong(1) === mortonN(xs, 3), s"n=$n xs=$xs")
      }
      // random draws at the max bits the budget allows for this n
      val maxBits = 63 / n
      val rnd = new scala.util.Random(7 * n)
      val wide = Seq.fill(100)(Seq.fill(n)(
        math.floorMod(rnd.nextLong(), 1L << maxBits)))
      val gotW = wide.map(t => Tuple1(t)).toDF("dims")
        .select($"dims",
          Layout.zorderKeyN((0 until n).map(d => $"dims".getItem(d)),
            maxBits).as("z"))
        .collect()
      gotW.foreach { r =>
        val xs = r.getSeq[Long](0)
        assert(r.getLong(1) === mortonN(xs, maxBits), s"n=$n xs=$xs")
      }
    }
  }

  test("zorderKeyN: n=2 agrees with zorderKey2, and the bit budget is " +
    "enforced") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val pairs = Seq.fill(100)(
      (math.floorMod(rnd.nextLong(), 1L << 16),
        math.floorMod(rnd.nextLong(), 1L << 16)))
    val rows = pairs.toDF("x", "y")
      .select(Layout.zorderKey2($"x", $"y", 16).as("a"),
        Layout.zorderKeyN(Seq($"x", $"y"), 16).as("b"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    intercept[IllegalArgumentException](
      Layout.zorderKeyN(Seq.empty, 8))
    intercept[IllegalArgumentException](
      Layout.zorderKeyN(Seq(lit(1), lit(1), lit(1)), 22)) // 3*22 > 63
  }

  test("zorderKey2 masks to the requested bits and rejects bad widths") {
    import spark.implicits._
    // values past the mask wrap (documented: callers bucket wider domains)
    val got = Seq((256L + 5L, 3L)).toDF("x", "y")
      .select(Layout.zorderKey2($"x", $"y", bits = 8)).collect()(0).getLong(0)
    assert(got === morton(5L, 3L, 8))
    intercept[IllegalArgumentException](Layout.zorderKey2(lit(1), lit(1), 0))
    intercept[IllegalArgumentException](Layout.zorderKey2(lit(1), lit(1), 32))
  }

  test("clusterByZOrder keeps BOTH dims narrow inside every partition") {
    import spark.implicits._
    // a 64×64 uniform grid clustered into 16 files: a single-column sort
    // would leave the non-sorted dim spanning the full 0..63 range in
    // every file; z-order clustering must bound the average span of BOTH
    // dims well below that
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
      .toDF("x", "y")
    val clustered = Layout.clusterByZOrder(grid, "x", "y",
      numPartitions = 16, bits = 6)
    val spans = clustered
      .select(spark_partition_id().as("p"), $"x", $"y")
      .groupBy($"p")
      .agg((max($"x") - min($"x")).as("sx"), (max($"y") - min($"y")).as("sy"))
      .collect()
    assert(spans.length === 16)
    val avgX = spans.map(_.getLong(1)).sum.toDouble / spans.length
    val avgY = spans.map(_.getLong(2)).sum.toDouble / spans.length
    // ideal 16-way z-partitioning of a 64×64 grid: 16×32 or 32×16 cells
    // (span 15/31 + range-boundary slop); a naive layout gives ~63 on
    // one of the two dims
    assert(avgX < 40, s"x span too wide: $avgX")
    assert(avgY < 40, s"y span too wide: $avgY")
    // and the zkey column is present for post-write audit, then droppable
    assert(clustered.columns.contains("zkey"))
  }

  test("clusterByZOrder rejects a pre-existing zkey column") {
    import spark.implicits._
    val df = Seq((1L, 2L, 3L)).toDF("x", "y", "zkey")
    intercept[IllegalArgumentException](
      Layout.clusterByZOrder(df, "x", "y", 4))
  }

  test("HilbertCurve.xy2d: literature 4x4 vector, exhaustive bijectivity " +
    "+ unit-step adjacency for bits 1..5, d2xy round-trip") {
    // the published 4x4 Hilbert walk (d = 0..15)
    val walk4 = Seq(
      (0L, 0L), (1L, 0L), (1L, 1L), (0L, 1L),
      (0L, 2L), (0L, 3L), (1L, 3L), (1L, 2L),
      (2L, 2L), (2L, 3L), (3L, 3L), (3L, 2L),
      (3L, 1L), (2L, 1L), (2L, 0L), (3L, 0L))
    walk4.zipWithIndex.foreach { case ((x, y), d) =>
      assert(HilbertCurve.xy2d(2, x, y) === d.toLong, s"cell ($x,$y)")
    }
    for (bits <- 1 to 5) {
      val side = 1L << bits
      val cells = for (x <- 0L until side; y <- 0L until side)
        yield (x, y, HilbertCurve.xy2d(bits, x, y))
      val ds = cells.map(_._3)
      assert(ds.toSet === (0L until side * side).toSet,
        s"bits=$bits not a bijection")
      // THE Hilbert property (Z-order lacks it): consecutive distances
      // are Manhattan-adjacent grid cells
      val byD = cells.map(c => c._3 -> ((c._1, c._2))).toMap
      (0L until side * side - 1).foreach { d =>
        val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
        assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1,
          s"bits=$bits: d=$d ($x1,$y1) -> ($x2,$y2) not adjacent")
      }
      // the inverse walks the same curve
      (0L until side * side).foreach { d =>
        val packed = HilbertCurve.d2xy(bits, d)
        assert((packed >> 32, packed & 0xFFFFFFFFL) === byD(d))
      }
    }
    // 31-bit corner stays in range and inverts
    val big = HilbertCurve.xy2d(31, (1L << 31) - 1, 0L)
    assert(big >= 0 && big < (1L << 62))
    val p = HilbertCurve.d2xy(31, big)
    assert((p >> 32) === (1L << 31) - 1 && (p & 0xFFFFFFFFL) === 0L)
  }

  test("hilbertKey2 expression matches HilbertCurve.xy2d; masks input; " +
    "nulls propagate") {
    import spark.implicits._
    val pts = (for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y))
    val got = pts.toDF("x", "y")
      .select($"x", $"y", Layout.hilbertKey2($"x", $"y", bits = 4).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) === HilbertCurve.xy2d(4, x, y))
    }
    // values beyond the bit budget mask down, like zorderKey2
    val masked = Seq((17L, 33L)).toDF("x", "y")
      .select(Layout.hilbertKey2($"x", $"y", bits = 4))
      .collect().head.getLong(0)
    assert(masked === HilbertCurve.xy2d(4, 1L, 1L))
    val nul = Seq((Some(1L), Option.empty[Long])).toDF("x", "y")
      .select(Layout.hilbertKey2($"x", $"y", bits = 4))
      .collect().head
    assert(nul.isNullAt(0))
  }

  test("clusterByHilbert is at least as tight as clusterByZOrder on " +
    "the 64x64 grid (the adjacency dividend)") {
    import spark.implicits._
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
      .toDF("x", "y")
    def avgSpans(df: org.apache.spark.sql.DataFrame): Double = {
      val spans = df
        .select(spark_partition_id().as("p"), $"x", $"y")
        .groupBy($"p")
        .agg((max($"x") - min($"x")).as("sx"),
          (max($"y") - min($"y")).as("sy"))
        .collect()
      spans.map(r => r.getLong(1) + r.getLong(2)).sum.toDouble /
        (2.0 * spans.length)
    }
    val h = avgSpans(Layout.clusterByHilbert(grid, "x", "y", 16, bits = 6))
    val z = avgSpans(Layout.clusterByZOrder(grid, "x", "y", 16, bits = 6))
    assert(h < 40, s"hilbert span too wide: $h")
    assert(h <= z + 1e-9, s"hilbert ($h) should not lose to z-order ($z)")
  }
}
