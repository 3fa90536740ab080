package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class CmsSpec extends SparkSuite {

  test("estimate is one-sided: >= exact for every item, overshoot " +
    "bounded by the co-resident weight") {
    import spark.implicits._
    // one hot item + 50 distinct fillers: any row's counter for "hot"
    // is 500 + (colliding fillers) <= 550, and min-of-rows >= exact
    val df = (Seq.fill(500)("hot") ++ (0 until 50).map(i => s"f$i"))
      .toDF("v")
    val regs = Cms.registers(df, Seq.empty, "v")
    val est = Cms.estimate(regs, Seq("hot", "f0").toDF("v"), "v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("hot") >= 500L && est("hot") <= 550L,
      s"hot estimate ${est("hot")} outside [500, 550]")
    assert(est("f0") >= 1L && est("f0") <= 501L)
  }

  test("sketches merge by element-wise sum: split corpus == whole corpus " +
    "(the incremental-load property)") {
    import spark.implicits._
    val all = (0 until 2000).map(i => s"value-${i % 97}").toDF("v")
    val whole = Cms.registers(all, Seq.empty, "v")
      .orderBy($"row", $"col").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val merged = Cms.merge(
      Cms.registers(all.filter($"v" < "value-5"), Seq.empty, "v")
        .unionByName(Cms.registers(all.filter($"v" >= "value-5"), Seq.empty, "v")),
      Seq.empty)
      .orderBy($"row", $"col").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(merged.toSeq === whole.toSeq)
    // merging away a group column == sketching the union directly
    val grouped = all.withColumn("g", when($"v" < "value-5", "a").otherwise("b"))
    val collapsed = Cms.merge(Cms.registers(grouped, Seq("g"), "v"), Seq.empty)
      .orderBy($"row", $"col").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(collapsed.toSeq === whole.toSeq)
  }

  test("counter cells address by the md5 prefix integer (hashlib-style " +
    "independent vector)") {
    import spark.implicits._
    // independently derive row 2's column for "x": first 15 hex chars
    // of md5("2:x") as a long, mod 64
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest("2:x".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    val expectCol = (java.lang.Long.parseLong(hex, 16) % 64).toInt
    val regs = Cms.registers(Seq("x", "x", "x").toDF("v"), Seq.empty, "v")
      .filter($"row" === 2).collect()
    assert(regs.length === 1)
    assert(regs.head.getInt(1) === expectCol)
    assert(regs.head.getLong(2) === 3L)
  }

  test("weighted counts: weight column flows into the counters") {
    import spark.implicits._
    val df = Seq(("x", 10L), ("x", 5L), ("y", 1L)).toDF("v", "w")
    val regs = Cms.registers(df, Seq.empty, "v", weight = col("w"))
    val est = Cms.estimate(regs, Seq("x").toDF("v"), "v")
      .collect().head.getLong(1)
    assert(est >= 15L && est <= 16L)
  }

  test("grouped sketches stay within d*w cells per group") {
    import spark.implicits._
    val df = (0 until 5000).map(i => (s"g${i % 3}", s"v$i")).toDF("g", "v")
    val regs = Cms.registers(df, Seq("g"), "v")
    val perGroup = regs.groupBy($"g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perGroup.values.foreach(n =>
      assert(n <= Cms.Depth * Cms.Width, s"group state $n cells"))
    assert(perGroup.size === 3)
  }
}
