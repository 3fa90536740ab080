package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The q_banding_recall measurement's own invariants (the oracle checks
  * VALUES; these pin the PROPERTIES a reader acts on):
  *   - exact duplicates (J = 1, decile 10) are ALWAYS candidates — all
  *     8 minhashes agree, so both bands collide; recall@10 below 1.0
  *     would mean the banding or the truth side broke, not "tuning";
  *   - found never exceeds truth per decile (it is a LEFT join from
  *     truth);
  *   - deciles stay in the J >= 0.25 support: 2..10. */
class BandingRecallSpec extends SparkSuite {

  test("recall@J=1.0 is exactly 1; found <= true; deciles in 2..10") {
    graft.functions.functions.register(spark)
    val rows = graft.SparkEntry.queries("q_banding_recall")(
      spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val byDecile = rows.map(r => r._1 -> (r._2, r._3)).toMap
    // the planted corpus guarantees exact-dup pairs in the % 5 sample
    assert(byDecile.contains(10L), s"no J=1 decile in ${rows.toSeq}")
    val (true10, found10) = byDecile(10L)
    assert(found10 === true10,
      s"banding missed ${true10 - found10} exact-duplicate pairs")
    rows.foreach { case (d, t, f) =>
      assert(f <= t, s"decile $d: found $f > true $t")
      assert(d >= 2 && d <= 10, s"decile $d outside the J>=0.25 support")
      assert(t >= 1)
    }
  }
}
