package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class HllSpec extends SparkSuite {

  test("HLL estimate lands within the m=64 error regime of exact distinct") {
    import spark.implicits._
    val df = (0 until 20000).map(i => ("g", s"value-$i")).toDF("g", "v")
    val regs = Hll.registers(df, Seq("g"), "v")
    val got = Hll.indicator(regs, Seq("g"))
      .select(Hll.estimateMicro($"hll_indicator")).collect().head.getLong(0)
    val est = got / 1e6
    // standard error at m=64 is ~13%; 3 sigma ≈ 40%
    assert(math.abs(est - 20000.0) / 20000.0 < 0.4,
      s"estimate $est too far from 20000")
  }

  test("registers are mergeable: max of split-corpus sketches == " +
    "whole-corpus sketch (the incremental-load property)") {
    import spark.implicits._
    val all = (0 until 5000).map(i => ("g", s"value-$i")).toDF("g", "v")
    val whole = Hll.registers(all, Seq("g"), "v")
      .orderBy($"bucket").collect().map(r => (r.getInt(1), r.getInt(2)))
    val merged = Hll.merge(
      Hll.registers(all.filter($"v" < "value-3"), Seq("g"), "v")
        .unionByName(Hll.registers(all.filter($"v" >= "value-3"), Seq("g"), "v")),
      Seq("g"))
      .orderBy($"bucket").collect().map(r => (r.getInt(1), r.getInt(2)))
    assert(merged.toSeq === whole.toSeq)
    // merging away the group column gives the same global sketch as
    // sketching everything unguarded
    val global = Hll.merge(Hll.registers(all, Seq("g"), "v"), Seq.empty)
      .orderBy($"bucket").collect().map(r => (r.getInt(0), r.getInt(1)))
    val direct = Hll.registers(all.select(lit("all").as("g"), $"v"), Seq.empty, "v")
      .orderBy($"bucket").collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(global.toSeq === direct.toSeq)
  }

  test("registers: duplicates don't move the sketch; rho is the md5 " +
    "trailing-zero rank") {
    import spark.implicits._
    val once = Seq(("g", "x"), ("g", "y")).toDF("g", "v")
    val thrice = Seq.fill(3)(Seq(("g", "x"), ("g", "y"))).flatten.toDF("g", "v")
    assert(
      Hll.registers(thrice, Seq("g"), "v").orderBy($"bucket").collect().toSeq ===
        Hll.registers(once, Seq("g"), "v").orderBy($"bucket").collect().toSeq)
    // hand-check one value against java's md5: bucket/rho derivation
    val h = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest("x".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15), 16)
    val w = h >>> 6
    val expectRho = if (w == 0) 55 else java.lang.Long.numberOfTrailingZeros(w) + 1
    val row = Hll.registers(once, Seq("g"), "v")
      .filter($"bucket" === (h % 64).toInt).collect()
    assert(row.exists(_.getInt(2) >= expectRho)) // x's bucket holds >= x's rho
  }

  test("indicator restores absent buckets at 2^55 and the shuffle " +
    "carries only register rows") {
    import spark.implicits._
    val df = Seq(("g", "only-one-value")).toDF("g", "v")
    val regs = Hll.registers(df, Seq("g"), "v")
    val ind = Hll.indicator(regs, Seq("g")).collect().head
    assert(ind.getAs[Int]("n_buckets_hit") === 1)
    val regRow = regs.collect().head
    val expected = (1L << (55 - regRow.getInt(2))) + 63L * (1L << 55)
    assert(ind.getAs[Long]("hll_indicator") === expected)
    // no UDF; partial aggregation means the exchange carries at most
    // (groups x 64) rows — assert the plan has a partial hash aggregate
    // below the exchange
    val plan = regs.queryExecution.executedPlan.toString
    assert(!plan.contains("UDF("))
    assert(plan.contains("HashAggregate"), plan.take(800))
  }
}
