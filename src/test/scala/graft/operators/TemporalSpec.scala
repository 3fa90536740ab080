package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class TemporalSpec extends SparkSuite {

  test("asof backward: latest prior row, exact-time inclusive, null on miss") {
    import spark.implicits._
    val left = Seq((1L, 100L, "p1"), (1L, 200L, "p2"), (2L, 50L, "p3"))
      .toDF("k", "t", "name")
    val right = Seq((1L, 90L, "r90"), (1L, 200L, "r200"), (1L, 300L, "r300"))
      .toDF("k", "rt", "rname")
    val out = Temporal.asofJoinBackward(left, right, "k", "t", "rt")
      .select($"name", $"asof.rname".as("matched"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out("p1") === Some("r90"))   // 90 <= 100, latest prior
    assert(out("p2") === Some("r200"))  // equal time included
    assert(out("p3") === None)          // no right rows for key 2
  }

  test("overlap join via bucket blocking equals brute force") {
    import spark.implicits._
    val rng = new scala.util.Random(3)
    val day = 86400000L
    val rows = (1 to 80).map { i =>
      val s = (rng.nextInt(40) * day / 4) + rng.nextInt(1000)
      (i % 3L, i.toLong, s, s + rng.nextInt(5) * day)
    }
    val df = rows.toDF("k", "id", "s", "e")
    val got = Temporal.overlapJoin(
      df.toDF("k", "id", "s", "e"), df.toDF("k", "id", "s", "e"),
      key = "k", startCol = "s", endCol = "e",
      pairFilter = col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (for {
      a <- rows; b <- rows
      if a._1 == b._1 && a._2 < b._2 && a._3 <= b._4 && b._3 <= a._4
    } yield (a._2, b._2)).toSet
    assert(got === expected)
  }

  test("sessionize splits on gaps, ids increase per key") {
    import spark.implicits._
    val gap = 1000L
    val df = Seq(
      (1L, 0L), (1L, 500L), (1L, 900L),    // session 1
      (1L, 5000L), (1L, 5500L),            // session 2
      (2L, 10L))                           // separate key
      .toDF("k", "t")
    val out = Temporal.sessionize(df, "k", "t", gap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.filter(_._1 == 1L).map(x => x._2 -> x._3).toMap ===
      Map(0L -> 1L, 500L -> 1L, 900L -> 1L, 5000L -> 2L, 5500L -> 2L))
    assert(out.filter(_._1 == 2L).head._3 === 1L)
  }
}
