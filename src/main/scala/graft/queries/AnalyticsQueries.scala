package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational analytics over the TPC-H-ish tables: scans, broadcast +
  * shuffle joins, partial aggregation, windows, rollup, semi/anti joins.
  *
  * The reference needs none of these directly (its querier is key-lookup
  * shaped), but they are the capabilities Catalyst gives the engine "for
  * free" (SURVEY §2.3) and the headline bench queries.
  *
  * Money math: each double source column is rounded to a scaled BIGINT
  * per row (cents, or 1e-4 dollars for price×discount products) BEFORE any
  * aggregation, so every sum/window is exact integer arithmetic —
  * deterministic under any partitioning/aggregation order AND byte-stable
  * across engines (double/decimal outputs hash differently between Spark
  * parquet and DuckDB even when values agree; integer outputs do not).
  */
object AnalyticsQueries {

  // plain reads: these queries are scan+agg/join shaped with low per-row
  // CPU, so an extra re-parallelizing exchange costs more than it saves.
  // Cached per (session, path) — plan reuse only, see Tables.readPlain.
  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.readPlain(s, dir, n)

  // per-row scaled-integer projections (round() is half-away-from-zero in
  // both Spark and DuckDB, and the input doubles are bit-identical parquet)
  private val QtyC = "CAST(round(l_quantity * 100) AS BIGINT)"
  private val PriceC = "CAST(round(l_extendedprice * 100) AS BIGINT)"
  private val DiscC = "CAST(round(l_discount * 100) AS BIGINT)"
  // extendedprice×(1−discount) in units of 1e-4 dollars, exactly
  private val Disc4 = s"$PriceC * (100 - $DiscC)"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // TPC-H Q1-shaped pricing summary: single scan, partial-agg friendly
    "q1_pricing_summary" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .filter($"l_shipdate" <= lit("2000-01-01").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum(expr(QtyC)).as("sum_qty_c"),
          sum(expr(PriceC)).as("sum_base_price_c"),
          sum(expr(Disc4)).as("sum_disc_price_4"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }),

    // TPC-H Q3-shaped: broadcast the filtered dimension, shuffle-join the
    // facts, top-k via TakeOrderedAndProject
    "q3_top_orders" -> ((s, dir) => {
      import s.implicits._
      val cust = t(s, dir, "customer").filter($"c_mktsegment" === "BUILDING")
        .select($"c_custkey")
      val ord = t(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_orderdate")
      val li = t(s, dir, "lineitem")
        .select($"l_orderkey", $"l_extendedprice", $"l_discount")
      li.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(cust), $"o_custkey" === $"c_custkey")
        .groupBy($"o_orderkey", $"o_orderdate")
        .agg(sum(expr(Disc4)).as("revenue_4"))
        .select($"o_orderkey", to_date($"o_orderdate").as("o_orderdate"),
          $"revenue_4")
        .orderBy($"revenue_4".desc, $"o_orderkey")
        .limit(10)
    }),

    // TPC-H Q5-shaped multi-way join: nation/region broadcast, the rest
    // shuffle on their keys
    "q5_region_revenue" -> ((s, dir) => {
      import s.implicits._
      val region = t(s, dir, "region").filter($"r_name" === "EUROPE")
      val nation = t(s, dir, "nation")
      val cust = t(s, dir, "customer")
      val ord = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      val supp = t(s, dir, "supplier")
      li.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(cust, $"o_custkey" === $"c_custkey")
        .join(supp, $"l_suppkey" === $"s_suppkey" &&
          $"s_nationkey" === $"c_nationkey")
        .join(broadcast(nation), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
        .groupBy($"n_name")
        .agg(sum(expr(Disc4)).as("revenue_4"))
        .orderBy($"n_name")
    }),

    // running window aggregate over a unique total order
    "q_window_running" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"l_suppkey")
        .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "lineitem")
        .filter($"l_suppkey" <= 3)
        .withColumn("running_qty_c", sum(expr(QtyC)).over(w))
        .select($"l_suppkey", $"l_orderkey", $"l_linenumber", $"running_qty_c")
        .orderBy($"l_suppkey", $"l_orderkey", $"l_linenumber")
    }),

    // rollup (grouping-sets family)
    "q_rollup_agg" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .rollup($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
            .as("sum_price_c"))
        .select(coalesce($"o_orderstatus", lit("ALL")).as("status"),
          coalesce($"o_orderpriority", lit("ALL")).as("priority"),
          $"n", $"sum_price_c")
        .orderBy($"status", $"priority")
    }),

    // distinct aggregation (expand + two-phase agg under the hood)
    "q_distinct_agg" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_suppkey")
        .agg(count(lit(1)).as("n_lines"),
          countDistinct($"l_partkey").as("n_parts"),
          countDistinct($"l_orderkey").as("n_orders"))
        .orderBy($"l_suppkey")
    }),

    // anti join: customers with no orders
    "q_anti_join" -> ((s, dir) => {
      import s.implicits._
      val ord = t(s, dir, "orders").select($"o_custkey")
      t(s, dir, "customer")
        .join(ord, $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    }),

    // semi join + aggregation: active customers per segment
    "q_semi_agg" -> ((s, dir) => {
      import s.implicits._
      val ord = t(s, dir, "orders").select($"o_custkey")
      t(s, dir, "customer")
        .join(ord, $"c_custkey" === $"o_custkey", "left_semi")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_active"),
          sum(expr("CAST(round(c_acctbal * 100) AS BIGINT)")).as("sum_bal_c"))
        .orderBy($"c_mktsegment")
    }),

    // Hilbert-curve layout audit, the q_zorder pairing: distances along
    // the 8-bit Hilbert curve (native expression — the per-level
    // rotation is data-dependent, no Morton-style mask cascade exists),
    // cut into 16 buckets of 4096 consecutive distances; every bucket
    // is a CONTIGUOUS 64x64 region (the adjacency property Z-order
    // lacks), so both dims' per-bucket spans stay tight
    "q_hilbert" -> ((s, dir) => {
      import s.implicits._
      val x = ($"l_orderkey" % 256).cast("long")
      val y = ($"l_partkey" % 256).cast("long")
      t(s, dir, "lineitem")
        .select(graft.operators.Layout.hilbertKey2(x, y, bits = 8)
          .as("hkey"), x.as("x"), y.as("y"))
        .withColumn("bucket", expr("hkey DIV 4096"))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n"),
          min($"x").as("min_x"), max($"x").as("max_x"),
          min($"y").as("min_y"), max($"y").as("max_y"))
        .orderBy($"bucket")
    }),

    // Z-order layout audit: interleave two 8-bit key dims into a Morton
    // key, cut the keyspace into 16 coarse buckets (the file boundaries a
    // clusterByZOrder write would realize), and report per-bucket min-max
    // spans of BOTH dims — each bucket's top 4 key bits pin both dims to
    // a 64-wide quarter, the narrow-span property that lets row-group
    // stats prune scans filtered on EITHER dimension. Map-side key math +
    // one hash agg.
    "q_zorder" -> ((s, dir) => {
      import s.implicits._
      val x = ($"l_orderkey" % 256).cast("long")
      val y = ($"l_partkey" % 256).cast("long")
      t(s, dir, "lineitem")
        .select(graft.operators.Layout.zorderKey2(x, y, bits = 8).as("zkey"),
          x.as("x"), y.as("y"))
        .withColumn("bucket", expr("zkey DIV 4096"))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n"),
          min($"x").as("min_x"), max($"x").as("max_x"),
          min($"y").as("min_y"), max($"y").as("max_y"))
        .orderBy($"bucket")
    }),

    // 3-D Z-order twin: interleave three 8-bit dims (24-bit key), cut on
    // the top 6 bits (64 coarse buckets = 2 bits per dim), and report all
    // three dims' per-bucket spans — every bucket pins each dim to a
    // 64-wide quarter, so row-group stats prune filters on ANY of the
    // three dimensions. Same map-side key math + one hash agg shape as
    // q_zorder.
    "q_zorder3" -> ((s, dir) => {
      import s.implicits._
      val x = ($"l_orderkey" % 256).cast("long")
      val y = ($"l_partkey" % 256).cast("long")
      val z = ($"l_suppkey" % 256).cast("long")
      t(s, dir, "lineitem")
        .select(graft.operators.Layout.zorderKeyN(Seq(x, y, z), bits = 8)
            .as("zkey"),
          x.as("x"), y.as("y"), z.as("z"))
        .withColumn("bucket", expr("zkey DIV 262144"))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n"),
          min($"x").as("min_x"), max($"x").as("max_x"),
          min($"y").as("min_y"), max($"y").as("max_y"),
          min($"z").as("min_z"), max($"z").as("max_z"))
        .orderBy($"bucket")
    }))

  /** q_zorder oracle: the spread cascade generated from the SAME
    * (shift, mask) list the operator folds over
    * ([[graft.operators.Layout.SpreadSteps]]) — one source of truth for
    * the bit math on both engines. */
  /** q_hilbert oracle: the per-level rotate-and-accumulate chain
    * unrolled as one CTE per level, generated from the SAME level list
    * the native expression's loop walks
    * ([[graft.operators.HilbertCurve.levels]]) — the ZOrderOracle
    * one-source-of-truth discipline for a transform whose steps are
    * data-dependent rather than a static mask cascade. */
  private val HilbertOracle: String = {
    val lvls = graft.operators.HilbertCurve.levels(8)
    val levelCtes = lvls.zipWithIndex.map { case (s, i) =>
      val prev = if (i == 0) "d0" else s"l$i"
      val m = s - 1
      s"""l${i + 1} AS (
         |  SELECT ox, oy,
         |    d + ${s * s} * (CASE WHEN rx = 1 AND ry = 1 THEN 2
         |      WHEN rx = 1 THEN 3 WHEN ry = 1 THEN 1 ELSE 0 END) AS d,
         |    (CASE WHEN ry = 1 THEN x WHEN rx = 0 THEN y
         |      ELSE $m - y END) & $m AS x,
         |    (CASE WHEN ry = 1 THEN y WHEN rx = 0 THEN x
         |      ELSE $m - x END) & $m AS y
         |  FROM (SELECT ox, oy, d, x, y,
         |      CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END AS rx,
         |      CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END AS ry
         |    FROM $prev))""".stripMargin
    }
    s"""WITH d0 AS (
       |  SELECT CAST(l_orderkey % 256 AS BIGINT) AS ox,
       |         CAST(l_partkey % 256 AS BIGINT) AS oy,
       |         CAST(0 AS BIGINT) AS d,
       |         CAST(l_orderkey % 256 AS BIGINT) AS x,
       |         CAST(l_partkey % 256 AS BIGINT) AS y
       |  FROM lineitem),
       |${levelCtes.mkString(",\n")}
       |SELECT d // 4096 AS bucket, count(*) AS n,
       |  min(ox) AS min_x, max(ox) AS max_x,
       |  min(oy) AS min_y, max(oy) AS max_y
       |FROM l${lvls.size} GROUP BY bucket ORDER BY bucket""".stripMargin
  }

  private val ZOrderOracle: String = {
    def spreadSql(v: String): String = {
      val steps = graft.operators.Layout.SpreadSteps.zipWithIndex.map {
        case ((sh, mask), i) =>
          val prev = if (i == 0) v else s"${v}s$i"
          s"((($prev) | (($prev) << $sh)) & $mask) AS ${v}s${i + 1}"
      }
      steps.mkString(",\n    ")
    }
    val n = graft.operators.Layout.SpreadSteps.size
    s"""WITH d AS (
       |  SELECT CAST(l_orderkey % 256 AS BIGINT) AS x,
       |         CAST(l_partkey % 256 AS BIGINT) AS y
       |  FROM lineitem),
       |sx AS (
       |  SELECT x, y,
       |    ${spreadSql("x")}
       |  FROM d),
       |sy AS (
       |  SELECT x, y, xs$n,
       |    ${spreadSql("y")}
       |  FROM sx),
       |z AS (
       |  SELECT x, y, (xs$n | (ys$n << 1)) AS zkey FROM sy)
       |SELECT zkey // 4096 AS bucket, count(*) AS n,
       |  min(x) AS min_x, max(x) AS max_x,
       |  min(y) AS min_y, max(y) AS max_y
       |FROM z GROUP BY bucket ORDER BY bucket""".stripMargin
  }

  /** q_zorder3 oracle: the stride-3 cascade generated from the SAME
    * step list the operator folds over
    * ([[graft.operators.Layout.spreadStepsN]](3, 8)) — one source of
    * truth for the bit math on both engines. */
  private val ZOrder3Oracle: String = {
    val steps = graft.operators.Layout.spreadStepsN(3, 8)
    def spreadSql(v: String): String =
      steps.zipWithIndex.map { case ((sh, mask), i) =>
        val prev = if (i == 0) v else s"${v}s$i"
        s"((($prev) | (($prev) << $sh)) & $mask) AS ${v}s${i + 1}"
      }.mkString(",\n    ")
    val n = steps.size
    s"""WITH d AS (
       |  SELECT CAST(l_orderkey % 256 AS BIGINT) AS x,
       |         CAST(l_partkey % 256 AS BIGINT) AS y,
       |         CAST(l_suppkey % 256 AS BIGINT) AS z
       |  FROM lineitem),
       |sx AS (SELECT x, y, z, ${spreadSql("x")} FROM d),
       |sy AS (SELECT x, y, z, xs$n, ${spreadSql("y")} FROM sx),
       |sz AS (SELECT x, y, z, xs$n, ys$n, ${spreadSql("z")} FROM sy),
       |m AS (
       |  SELECT x, y, z,
       |    (xs$n | (ys$n << 1) | (zs$n << 2)) AS zkey FROM sz)
       |SELECT zkey // 262144 AS bucket, count(*) AS n,
       |  min(x) AS min_x, max(x) AS max_x,
       |  min(y) AS min_y, max(y) AS max_y,
       |  min(z) AS min_z, max(z) AS max_z
       |FROM m GROUP BY bucket ORDER BY bucket""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "q_hilbert" -> HilbertOracle,

    "q_zorder" -> ZOrderOracle,
    "q_zorder3" -> ZOrder3Oracle,

    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_price_c,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |           (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS sum_disc_price_4,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-01-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_top_orders" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |           (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_4
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue_4 DESC, o_orderkey LIMIT 10""".stripMargin,

    "q5_region_revenue" ->
      """SELECT n_name,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |           (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_4
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'EUROPE'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q_window_running" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) OVER (
        |    PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS running_qty_c
        |FROM lineitem WHERE l_suppkey <= 3
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,

    "q_rollup_agg" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |       coalesce(o_orderpriority, 'ALL') AS priority,
        |       count(*) AS n,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c
        |FROM orders
        |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,

    "q_distinct_agg" ->
      """SELECT l_suppkey, count(*) AS n_lines,
        |       count(DISTINCT l_partkey) AS n_parts,
        |       count(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_semi_agg" ->
      """SELECT c_mktsegment, count(*) AS n_active,
        |       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS sum_bal_c
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
}
