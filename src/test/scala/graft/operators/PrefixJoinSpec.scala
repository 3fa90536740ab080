package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The VERDICT r12 #1 fix: prefix-filtered exact Jaccard self-join.
  * Three contracts: (1) bit-identical results vs a brute-force all-pairs
  * oracle on randomized corpora (losslessness of the prefix lemma +
  * exactness of the verify); (2) a planted stopword hot key generates a
  * BOUNDED candidate set where the old join-on-every-token was
  * per-block quadratic; (3) threshold boundary pairs (J exactly 0.25)
  * are kept, just-below dropped — integer arithmetic, no FP fuzz. */
class PrefixJoinSpec extends SparkSuite {

  private def mkBase(rows: Seq[(Long, String, Int, Seq[String])]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "lang", "size_bucket", "words")
      .withColumn("words", array_distinct($"words".cast("array<string>")))
  }

  /** Brute-force oracle: all same-block pairs with inter*den >= union*num. */
  private def bruteForce(rows: Seq[(Long, String, Int, Seq[String])],
      num: Int, den: Int): Set[(Long, Long, Int, Int)] = {
    val recs = rows.map { case (id, lang, b, ws) => (id, lang, b, ws.distinct.toSet) }
    (for {
      a <- recs; b <- recs
      if a._1 < b._1 && a._2 == b._2 && a._3 == b._3
      inter = (a._4 intersect b._4).size
      union = a._4.size + b._4.size - inter
      if inter * den >= union * num
    } yield (a._1, b._1, inter, union)).toSet
  }

  private def collected(df: DataFrame): Set[(Long, Long, Int, Int)] =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSet

  test("jaccardSelfJoin matches brute force on a randomized corpus") {
    // deterministic PRNG: vocab mixes hot stopwords with rare tails so
    // prefixes actually cut something, sizes vary so the length filter
    // and ceil prefix-length arithmetic get exercised across n=1..30
    val rnd = new scala.util.Random(42)
    val stop = Vector("the", "a", "of", "and", "to")
    val rare = (0 until 400).map(i => s"w$i")
    val rows = (1L to 200L).map { id =>
      val n = 1 + rnd.nextInt(30)
      val ws = Seq.fill(n)(
        if (rnd.nextInt(3) == 0) stop(rnd.nextInt(stop.size))
        else rare(rnd.nextInt(rare.size)))
      (id, if (rnd.nextBoolean()) "en" else "de", rnd.nextInt(3), ws)
    }
    for ((num, den) <- Seq((1, 4), (1, 2), (3, 4), (1, 1))) {
      val got = collected(Dedup.jaccardSelfJoin(
        mkBase(rows), "doc_id", "words", Seq("lang", "size_bucket"), num, den))
      assert(got === bruteForce(rows, num, den), s"threshold $num/$den")
    }
  }

  test("planted near-dup clones survive among hot-key noise") {
    // 3 exact-clone groups + noise docs sharing only stopwords: the
    // clones MUST pair (J=1), the noise must not (J well under 0.25)
    val clone = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta", "the")
    val rows =
      (1L to 3L).map(id => (id, "en", 0, clone)) ++
      (10L to 60L).map(id => (id, "en", 0,
        Seq("the", "a", "of", s"only$id", s"u1x$id", s"u2x$id", s"u3x$id",
          s"u4x$id", s"u5x$id", s"u6x$id", s"u7x$id", s"u8x$id")))
    val got = collected(Dedup.jaccardSelfJoin(
      mkBase(rows), "doc_id", "words", Seq("lang", "size_bucket"), 1, 4))
    assert(got === bruteForce(rows, 1, 4))
    assert(got.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 7))
  }

  test("stopword hot key: candidate volume is bounded, not quadratic") {
    // 2000 same-block docs: every doc carries the stopwords {the, a}
    // (df=2000 each), ~10% also carry "of" (df≈200), and each has 9
    // unique words. The old join-on-every-token generated C(2000,2) ≈
    // 2M candidates off the "the"/"a" keys alone. With prefix filtering:
    //   docs with "of" have n=12 distinct → plen = 12-ceil(12/4)+1 = 10;
    //     rank order by (df asc, word) = 9 uniques, then "of" at rank 10,
    //     "a"/"the" at 11/12 → prefix = uniques + "of";
    //   docs without have n=11 → plen = 9 → uniques only.
    // So the ONLY shared key is "of" among its ~200 carriers — the pure
    // prefix bound would be C(nOf,2) ≈ 20k, two orders of magnitude
    // under the old 2M. The positional filter then kills even those:
    // "of" sits at rank 10 of n=12 on both sides, so the best remaining
    // overlap is 1 + min(12-10, 12-10) = 3 < alpha = ceil(24/5) = 5 —
    // no qualifying pair can have "of" as its first shared token, and
    // the uniques are unshared, so candidates are exactly ZERO where
    // every-token joining produced ~2M. The assert pins the count so a
    // regression to hot-key joining is unmissable.
    val rnd = new scala.util.Random(7)
    val rows = (1L to 2000L).map { id =>
      val stops = Seq("the", "a") ++ (if (rnd.nextInt(10) == 0) Seq("of") else Seq())
      (id, "en", 0, stops ++ (1 to 9).map(k => s"uniq${id}x$k"))
    }
    val cands = Dedup.prefixFilterCandidates(
      mkBase(rows), "doc_id", "words", Seq("lang", "size_bucket"), 1, 4)
    val got = cands.count()
    assert(got === 0L,
      s"candidate count $got; expected 0; every-token joining " +
        "would have produced ~2M")
    val verified = Dedup.jaccardSelfJoin(
      mkBase(rows), "doc_id", "words", Seq("lang", "size_bucket"), 1, 4)
    assert(verified.count() === 0L)
  }

  test("empty-words rows never pair and never break the build " +
    "(the documented jaccardSelfJoin contract, ADVICE r14 #3)") {
    // an empty set has no prefix tokens and Jaccard 0 against anything,
    // so empty-words rows are absent from BOTH sides by design — even
    // when every other row in the block would pair with a non-empty twin
    val rows = Seq(
      (1L, "en", 0, Seq("k1", "k2", "k3", "k4")),
      (2L, "en", 0, Seq("k1", "k2", "k3", "k4")),
      (3L, "en", 0, Seq.empty[String]), // empty words
      (4L, "en", 0, Seq.empty[String])) // two: an empty-empty pair bait
    for (cap <- Seq("0", "1000000")) { // both prefix paths
      spark.conf.set(Dedup.BroadcastVocabCapKey, cap)
      try {
        val got = collected(Dedup.jaccardSelfJoin(
          mkBase(rows), "doc_id", "words", Seq("lang", "size_bucket"), 1, 4))
        assert(got === Set((1L, 2L, 4, 4)), s"cap=$cap")
      } finally spark.conf.unset(Dedup.BroadcastVocabCapKey)
    }
  }

  test("threshold boundary: J exactly num/den kept, just below dropped") {
    // |a|=|b|=5, inter=2 → union=8, 2*4 >= 8*1 → J=0.25 exactly: KEPT
    // |a|=5,|b|=6, inter=2 → union=9, 8 < 9: DROPPED
    val rows = Seq(
      (1L, "en", 0, Seq("k1", "k2", "x1", "x2", "x3")),
      (2L, "en", 0, Seq("k1", "k2", "y1", "y2", "y3")),
      (3L, "en", 0, Seq("k1", "k2", "z1", "z2", "z3", "z4")))
    val got = collected(Dedup.jaccardSelfJoin(
      mkBase(rows), "doc_id", "words", Seq("lang", "size_bucket"), 1, 4))
    assert(got === Set((1L, 2L, 2, 8)))
  }

  test("crossover: broadcast and shuffle prefix paths are bit-identical") {
    // the r14 fast path (VERDICT r13 #1): vocab under the cap derives
    // prefixes map-side off a driver-collected df map; forcing the cap
    // to 0 disables it, and a tiny cap exercises the loud over-cap
    // fallback. All three must produce the same pairs.
    val rnd = new scala.util.Random(11)
    val stop = Vector("the", "a", "of")
    val rows = (1L to 150L).map { id =>
      val n = 1 + rnd.nextInt(20)
      val ws = Seq.fill(n)(
        if (rnd.nextInt(3) == 0) stop(rnd.nextInt(stop.size))
        else s"w${rnd.nextInt(200)}")
      (id, "en", rnd.nextInt(2), ws)
    }
    def run(): Set[(Long, Long, Int, Int)] = collected(Dedup.jaccardSelfJoin(
      mkBase(rows), "doc_id", "words", Seq("lang", "size_bucket"), 1, 4))
    val broadcast = run() // default cap: vocab (~203) fits easily
    try {
      spark.conf.set(Dedup.BroadcastVocabCapKey, "0") // fast path disabled
      val shuffle = run()
      spark.conf.set(Dedup.BroadcastVocabCapKey, "10") // vocab > cap: fallback
      val fallback = run()
      assert(broadcast === shuffle)
      assert(broadcast === fallback)
      assert(broadcast === bruteForce(rows, 1, 4))
    } finally spark.conf.unset(Dedup.BroadcastVocabCapKey)
  }

  test("reliable-checkpoint mode produces identical results") {
    // the Checkpoints.pin seam (VERDICT r13 wrong #2): with
    // spark.graft.checkpoint.dir set, every barrier in the join becomes
    // a reliable checkpoint (recomputable after executor loss) — same
    // pairs, different barrier family.
    val rows = (1L to 60L).map { id =>
      (id, "en", 0, Seq(s"a$id", s"b$id", "the", "shared1", "shared2",
        s"c${id % 7}"))
    }
    def run(): Set[(Long, Long, Int, Int)] = collected(Dedup.jaccardSelfJoin(
      mkBase(rows), "doc_id", "words", Seq("lang", "size_bucket"), 1, 4))
    val local = run()
    val dir = tmpDir("graft-reliable-ckpt")
    try {
      spark.conf.set(Checkpoints.ReliableDirKey, dir)
      val reliable = run()
      assert(reliable === local)
      assert(reliable === bruteForce(rows, 1, 4))
      // the reliable mode actually wrote checkpoint files (the flag is
      // live, not silently ignored). The context checkpoint dir is
      // process-global and SET ONCE — another suite may have won the
      // race — and getCheckpointDir returns a file:-schemed URI that
      // java.io.File cannot resolve, so strip the scheme and check the
      // GLOBAL dir (wherever this JVM's reliable checkpoints land).
      def anyFile(f: java.io.File): Boolean =
        f.isFile || Option(f.listFiles()).getOrElse(Array.empty).exists(anyFile)
      assert(spark.sparkContext.getCheckpointDir.isDefined)
      val globalDir = new org.apache.hadoop.fs.Path(
        spark.sparkContext.getCheckpointDir.get).toUri.getPath
      assert(anyFile(new java.io.File(globalDir)),
        s"no checkpoint files under $globalDir")
    } finally spark.conf.unset(Checkpoints.ReliableDirKey)
  }

  test("blocking: identical docs in different blocks never pair") {
    val ws = Seq("p", "q", "r")
    val rows = Seq((1L, "en", 0, ws), (2L, "en", 1, ws), (3L, "de", 0, ws),
      (4L, "en", 0, ws))
    val got = collected(Dedup.jaccardSelfJoin(
      mkBase(rows), "doc_id", "words", Seq("lang", "size_bucket"), 1, 4))
    assert(got === Set((1L, 4L, 3, 3)))
  }
}
