package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class QuantilesSpec extends SparkSuite {

  test("exactKth matches the sort definition on fuzzed multisets") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // heavy duplicates, negatives, a huge-range group, a singleton group
    val rows = Seq.tabulate(5000) { i =>
      val g = s"g${i % 4}"
      val v = g match {
        case "g0" => rnd.nextInt(10).toLong // dense duplicates
        case "g1" => rnd.nextLong() % 1000000000L // wide range, negatives
        case "g2" => rnd.nextInt(3).toLong - 1 // tiny domain
        case _ => rnd.nextInt(100000).toLong
      }
      (g, v)
    } :+ (("solo", 42L))
    val df = rows.toDF("grp", "v").repartition(8)

    val ranks = Seq(
      "min" -> expr("CAST(1 AS BIGINT)"),
      "median" -> expr("(__n + 1) div 2"),
      "p90" -> expr("(9 * __n + 9) div 10"),
      "max" -> expr("__n"))
    val got = Quantiles.exactKth(df, "grp", "v", ranks, bucketWidth = 97L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap

    // oracle: in-memory sort per group
    val byGrp = rows.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    for ((g, vs) <- byGrp) {
      val n = vs.length
      val expect = Map(
        "min" -> vs(0),
        "median" -> vs(((n + 1) / 2) - 1),
        "p90" -> vs(((9 * n + 9) / 10) - 1),
        "max" -> vs(n - 1))
      for ((label, want) <- expect)
        assert(got((g, label)) === want, s"($g, $label)")
    }
    // exactly one row per (group, label)
    assert(got.size === byGrp.size * ranks.size)
  }

  test("exactKth plan has no whole-group sort window") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (s"g${i % 2}", i.toLong)).toDF("grp", "v")
    val plan = Quantiles.exactKth(df, "grp", "v",
      Seq("median" -> expr("(__n + 1) div 2")))
      .queryExecution.executedPlan.toString
    // windows must partition by (grp, __bkt-derived) structures only after
    // histogram collapse; the raw input is never window-sorted — assert
    // the plan aggregates (histogram) before any Window appears
    val aggIdx = plan.indexOf("HashAggregate")
    val winIdx = plan.indexOf("Window")
    assert(aggIdx >= 0 && winIdx >= 0)
    // physical plans print top-down: the Window operator must sit ABOVE
    // (earlier in the string than) the deepest aggregate, i.e. windows
    // consume aggregated input, not the raw scan
    assert(plan.lastIndexOf("HashAggregate") > winIdx,
      s"window not fed by histogram aggregate:\n$plan")
  }
}
