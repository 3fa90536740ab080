package graft.queries

import graft.SparkSuite

/** The band-width tuning curve's structural invariants (VERDICT r13 #5):
  *   - recall@J=1 is 1.0 for EVERY configuration — exact text dups share
  *     all 8 minhashes, so any banding of them collides (precondition
  *     verified by BandingRecallSpec's text-identity check);
  *   - narrower bands are strictly more permissive: a 4-hash band match
  *     implies both 2-hash halves match, which implies all four 1-hash
  *     bands match — so candidate counts and per-decile found counts are
  *     monotone in the band count (2x4 <= 4x2 <= 8x1);
  *   - truth is config-independent (it is the same exact Jaccard);
  *   - found <= true per decile (LEFT join from truth). */
class BandingCurveSpec extends SparkSuite {

  test("curve: recall@10 = 1 per config; candidates/found monotone in " +
    "band count; truth config-independent") {
    graft.functions.functions.register(spark)
    val rows = graft.SparkEntry.queries("q_banding_curve")(
      spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val configs = rows.map(r => (r._1, r._2)).distinct.sorted
    assert(configs === Seq((2, 4), (4, 2), (8, 1)))

    val byConfig = rows.groupBy(_._1)
    // truth deciles identical across configs
    val truths = byConfig.view.mapValues(
      _.map(r => (r._3, r._4)).toSet).toMap
    assert(truths(2) === truths(4) && truths(4) === truths(8),
      s"truth side varied across configs: $truths")

    for ((bands, rs) <- byConfig) {
      val byDecile = rs.map(r => r._3 -> (r._4, r._5)).toMap
      assert(byDecile.contains(10L), s"bands=$bands: no J=1 decile")
      val (t10, f10) = byDecile(10L)
      assert(f10 === t10,
        s"bands=$bands missed ${t10 - f10} exact-duplicate pairs")
      rs.foreach { case (_, _, d, t, f, _) =>
        assert(f <= t, s"bands=$bands decile $d: found $f > true $t")
      }
    }
    // monotone permissiveness: candidates and per-decile found grow with
    // band count
    def candOf(b: Int): Long = byConfig(b).head._6
    assert(candOf(2) <= candOf(4) && candOf(4) <= candOf(8),
      s"candidate counts not monotone: ${Seq(2, 4, 8).map(candOf)}")
    val found = (b: Int) => byConfig(b).map(r => r._3 -> r._5).toMap
    for (d <- found(2).keySet) {
      assert(found(2)(d) <= found(4)(d) && found(4)(d) <= found(8)(d),
        s"decile $d found counts not monotone")
    }
  }
}
