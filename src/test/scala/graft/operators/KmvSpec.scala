package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class KmvSpec extends SparkSuite {

  private def hashesOf(values: Seq[String]): Seq[Long] = {
    import spark.implicits._
    values.toDF("v").select(Kmv.h60($"v")).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
  }

  test("below k the sketch IS the exact sorted distinct hash set") {
    import spark.implicits._
    val vals = (0 until 10).map(i => s"v$i")
    val got = Kmv.sketch(vals.toDF("v"), Seq.empty, "v", k = 64)
      .collect().head.getSeq[Long](0)
    assert(got === hashesOf(vals))
  }

  test("at k the sketch keeps exactly the k smallest distinct hashes, " +
    "duplicates and partitioning are invisible") {
    import spark.implicits._
    val vals = (0 until 1000).map(i => s"v$i")
    val expect = hashesOf(vals).take(16)
    val once = Kmv.sketch(vals.toDF("v"), Seq.empty, "v", k = 16)
      .collect().head.getSeq[Long](0)
    assert(once === expect)
    val noisy = (vals ++ vals ++ vals.take(100)).toDF("v").repartition(7)
    val again = Kmv.sketch(noisy, Seq.empty, "v", k = 16)
      .collect().head.getSeq[Long](0)
    assert(again === expect)
  }

  test("merge law: k-min of split-corpus sketches == whole-corpus sketch") {
    import spark.implicits._
    val vals = (0 until 500).map(i => s"x$i")
    val whole = Kmv.sketch(vals.toDF("v"), Seq.empty, "v", k = 32)
      .select($"kmv")
    val halves = Kmv.sketch(vals.take(250).toDF("v"), Seq.empty, "v", k = 32)
      .select($"kmv".as("a"))
      .crossJoin(
        Kmv.sketch(vals.drop(250).toDF("v"), Seq.empty, "v", k = 32)
          .select($"kmv".as("b")))
      .select(Kmv.mergeSketches($"a", $"b", 32).as("kmv"))
    assert(halves.collect().head.getSeq[Long](0) ===
      whole.collect().head.getSeq[Long](0))
  }

  test("estimator: exact below k, within the k=64 error regime above") {
    import spark.implicits._
    val small = Kmv.sketch((0 until 40).map(i => s"s$i").toDF("v"),
      Seq.empty, "v", k = 64)
      .select(Kmv.estimateMicro($"kmv")).collect().head.getLong(0)
    assert(small === 40L * 1000000L, "below k the estimate is exact")
    val big = Kmv.sketch((0 until 20000).map(i => s"b$i").toDF("v"),
      Seq.empty, "v", k = 64)
      .select(Kmv.estimateMicro($"kmv")).collect().head.getLong(0)
    val est = big / 1e6
    // relative error ~ 1/sqrt(63) ≈ 12.6%; 3 sigma ≈ 38%
    assert(math.abs(est - 20000.0) / 20000.0 < 0.4,
      s"estimate $est too far from 20000")
  }

  test("jaccardHits tracks true overlap; disjoint sets give zero") {
    import spark.implicits._
    // A = 0..999, B = 500..1499: true J = 500/1500 = 1/3
    val a = (0 until 1000).map(i => s"j$i")
    val b = (500 until 1500).map(i => s"j$i")
    val skA = Kmv.sketch(a.toDF("v"), Seq.empty, "v").select($"kmv".as("a"))
    val skB = Kmv.sketch(b.toDF("v"), Seq.empty, "v").select($"kmv".as("b"))
    val hits = skA.crossJoin(skB)
      .select(Kmv.jaccardHits($"a", $"b")).collect().head.getInt(0)
    val j = hits / 64.0
    assert(j > 0.15 && j < 0.55, s"jaccard estimate $j vs true 0.333")
    val disj = (0 until 1000).map(i => s"z$i")
    val skD = Kmv.sketch(disj.toDF("v"), Seq.empty, "v")
      .select($"kmv".as("b"))
    assert(skA.crossJoin(skD)
      .select(Kmv.jaccardHits($"a", $"b")).collect().head.getInt(0) === 0)
  }

  test("the aggregate partial-aggregates map-side (shuffle carries " +
    "sketches, not values)") {
    import spark.implicits._
    val df = (0 until 5000).map(i => (s"g${i % 3}", s"v$i")).toDF("g", "v")
    val plan = Kmv.sketch(df, Seq("g"), "v")
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_kmv_sketch"),
      s"no map-side partial aggregate in:\n$plan")
  }
}
