package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** The r18 dense bitmask path of [[Dedup.jaccardSelfJoin]]: on a
  * ≤64-token vocabulary the prefix filter degenerates (every token is
  * in most records — measured 6.75M pre-distinct candidate rows for
  * 588K within-block pairs at sf0.1), so word sets become 64-bit masks
  * and the block all-pairs join computes exact |∩| via bit_count.
  * Contracts: (1) bit-identical output to the prefix+verify path across
  * thresholds, including empty/null-element word sets and boundary
  * pairs; (2) the mask kernel's bit assignment, null-skip, and
  * loud-fail-on-missing-token semantics. */
class DenseJaccardSpec extends SparkSuite {

  private def mkBase(rows: Seq[(Long, String, Int, Seq[String])]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "lang", "size_bucket", "words")
      .withColumn("words", array_distinct($"words".cast("array<string>")))
  }

  private def collected(df: DataFrame): Set[(Long, Long, Int, Int)] =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSet

  /** Brute-force oracle: all same-block pairs with inter*den >= union*num
    * (n counts array elements incl. null, intersect skips nulls — the
    * join-on-token semantics both engine paths implement). */
  private def bruteForce(rows: Seq[(Long, String, Int, Seq[String])],
      num: Int, den: Int): Set[(Long, Long, Int, Int)] = {
    val recs = rows.map { case (id, lang, b, ws) =>
      val d = ws.distinct
      (id, lang, b, d.filter(_ != null).toSet, d.size)
    }
    (for {
      a <- recs; b <- recs
      if a._1 < b._1 && a._2 == b._2 && a._3 == b._3
      if a._5 > 0 && b._5 > 0 && (a._4.nonEmpty || b._4.nonEmpty ||
        // empty-SET records with null elements still pair-test (and
        // fail the threshold); truly empty ARRAYS never pair
        (a._5 > 0 && b._5 > 0))
      inter = (a._4 intersect b._4).size
      union = a._5 + b._5 - inter
      if inter * den >= union * num
    } yield (a._1, b._1, inter, union)).toSet
  }

  private def withCap[T](cap: String)(f: => T): T = {
    spark.conf.set(Dedup.DenseVocabCapKey, cap)
    try f finally spark.conf.unset(Dedup.DenseVocabCapKey)
  }

  test("dense path ≡ sparse path ≡ brute force on a small-vocab corpus " +
    "across thresholds (the q_ngram_jaccard shape)") {
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 31).map(i => s"tok$i")
    val rows = (1L to 150L).map { id =>
      val n = 1 + rnd.nextInt(28)
      (id, if (rnd.nextBoolean()) "en" else "zh", rnd.nextInt(3),
        Seq.fill(n)(vocab(rnd.nextInt(vocab.size))))
    }
    for ((num, den) <- Seq((1, 4), (1, 2), (3, 4), (1, 1))) {
      val dense = collected(Dedup.jaccardSelfJoin(
        mkBase(rows), "doc_id", "words", Seq("lang", "size_bucket"),
        num, den))
      val sparse = withCap("0") {
        collected(Dedup.jaccardSelfJoin(
          mkBase(rows), "doc_id", "words", Seq("lang", "size_bucket"),
          num, den))
      }
      assert(dense === sparse, s"dense != sparse at $num/$den")
      assert(dense === bruteForce(rows, num, den), s"threshold $num/$den")
    }
  }

  test("edge cases: empty word arrays never pair, null elements count " +
    "toward n but never intersect — dense ≡ sparse") {
    import spark.implicits._
    val base = Seq(
      (1L, "en", 0, Seq("a", "b", "c")),
      (2L, "en", 0, Seq("a", "b", "d")),
      (3L, "en", 0, Seq.empty[String]),      // empty: never pairs
      (4L, "en", 0, Seq[String](null)),      // all-null: fails threshold
      (5L, "en", 0, Seq("a", null, "b")),    // null among real tokens
      (6L, "en", 0, Seq.empty[String]))      // second empty: the
        // empty-empty union=0 pair must NOT appear (0 >= 0 would pass)
      .toDF("doc_id", "lang", "size_bucket", "words")
      .withColumn("words", array_distinct($"words".cast("array<string>")))
    val dense = collected(Dedup.jaccardSelfJoin(
      base, "doc_id", "words", Seq("lang", "size_bucket"), 1, 4))
    val sparse = withCap("0") {
      collected(Dedup.jaccardSelfJoin(
        base, "doc_id", "words", Seq("lang", "size_bucket"), 1, 4))
    }
    assert(dense === sparse)
    assert(!dense.exists(p => p._1 == 3L || p._2 == 3L || p._2 == 6L),
      "empty word arrays must never pair")
    // (1,2): inter {a,b} = 2, union 4, 2*4 >= 4*1 — present
    assert(dense.contains((1L, 2L, 2, 4)))
    // (1,5): words(5) = [a, null, b] → n=3, inter=2, union 3+3-2=4
    assert(dense.contains((1L, 5L, 2, 4)))
  }

  test("vocab boundary: 64 tokens ride the dense path, 65 fall back — " +
    "both match brute force") {
    val rnd = new scala.util.Random(11)
    def corpus(v: Int): Seq[(Long, String, Int, Seq[String])] = {
      val vocab = (0 until v).map(i => f"t$i%03d")
      // every token used at least once so the dfreq vocab is exactly v
      (1L to 80L).map { id =>
        val forced = vocab(((id - 1) % v).toInt)
        (id, "en", 0,
          forced +: Seq.fill(6)(vocab(rnd.nextInt(vocab.size))))
      }
    }
    for (v <- Seq(64, 65)) {
      val rows = corpus(v)
      val got = collected(Dedup.jaccardSelfJoin(
        mkBase(rows), "doc_id", "words", Seq("lang", "size_bucket"), 1, 4))
      assert(got === bruteForce(rows, 1, 4), s"vocab $v")
    }
  }

  test("VocabMask kernel: sorted-position bits, null elements skipped, " +
    "missing token fails loud; caps above 64 clamp") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val vocab = Array("a", "b", "z").map(UTF8String.fromString)
    def arr(ws: Any*): GenericArrayData =
      new GenericArrayData(ws.map {
        case s: String => UTF8String.fromString(s)
        case other => other
      }.toArray[Any])
    assert(graft.functions.VocabMask.compute(arr("a"), vocab) === 1L)
    assert(graft.functions.VocabMask.compute(arr("z", "a"), vocab) === 5L)
    assert(graft.functions.VocabMask.compute(arr("b", null), vocab) === 2L)
    assert(graft.functions.VocabMask.compute(arr(), vocab) === 0L)
    val e = intercept[IllegalStateException] {
      graft.functions.VocabMask.compute(arr("q"), vocab)
    }
    assert(e.getMessage.contains("vocab_mask"))
    // a 65-entry vocab is rejected at expression construction
    val big = (0 to 64).map(i => UTF8String.fromString(s"v$i")).toArray
    assertThrows[IllegalArgumentException] {
      graft.functions.VocabMaskExpr(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          Seq("v0"), org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StringType)), big)
    }
  }

  test("a malformed dense-cap conf value fails loud, naming the key") {
    val e = intercept[IllegalArgumentException] {
      withCap("not-a-number") {
        Dedup.jaccardSelfJoin(
          mkBase(Seq((1L, "en", 0, Seq("a")))),
          "doc_id", "words", Seq("lang", "size_bucket"), 1, 4)
      }
    }
    assert(e.getMessage.contains(Dedup.DenseVocabCapKey))
  }
}
