package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class SelectionSpec extends SparkSuite {

  /** Disjoint vocabularies: target docs speak only {aa bb cc}, source
    * docs only {xx yy zz} — the cleanest possible separation, so the
    * sign of every weight is forced. */
  lazy val corpus = {
    import spark.implicits._
    Seq(
      (1L, "aa bb cc aa bb", true),
      (2L, "cc aa bb cc", true),
      (3L, "xx yy zz xx", false),
      (4L, "zz zz yy xx yy", false))
      .toDF("doc_id", "text", "t")
  }

  test("weights separate target-like from source-like documents") {
    val w = Selection.dsirWeights(corpus, col("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(w(1L) > 0 && w(2L) > 0,
      s"target docs should score positive: $w")
    assert(w(3L) < 0 && w(4L) < 0,
      s"source docs should score negative: $w")
  }

  test("n_tokens counts whitespace tokens (empties dropped)") {
    val n = Selection.dsirWeights(corpus, col("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(n === Map(1L -> 5L, 2L -> 4L, 3L -> 4L, 4L -> 5L))
  }

  test("buckets=1 collapses to n_tokens * lr(0) — the formula is " +
    "auditable end-to-end") {
    // with one bucket: ct=9 (target tokens), cs=9, totals 9/9, so
    // lr = round(ln((10*10)/(10*10))*1e6) = 0 and every weight is 0
    val w = Selection.dsirWeights(corpus, col("t"), buckets = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(w.values.forall(_ == 0L), s"one-bucket weights must be 0: $w")
  }

  test("weight is deterministic under repartition (integer-sum " +
    "order-independence)") {
    val a = Selection.dsirWeights(corpus, col("t"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1).toSeq
    val b = Selection.dsirWeights(corpus.repartition(7), col("t"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1).toSeq
    assert(a === b)
  }

  test("is_target passes through") {
    val t = Selection.dsirWeights(corpus, col("t"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(t === Map(1L -> true, 2L -> true, 3L -> false, 4L -> false))
  }

  test("dsirResample: deterministic, k-bounded, ranks contiguous, and " +
    "a dominant weight always wins") {
    import spark.implicits._
    val weighted = (0L until 200L)
      .map(i => (i, if (i == 77L) 50000000L else 0L))
      .toDF("doc_id", "weight_micro")
    val once = Selection.dsirResample(weighted, k = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    val again = Selection.dsirResample(weighted.repartition(13), k = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(once === again, "resampling must be deterministic")
    assert(once.length === 10)
    assert(once.map(_._1) === (1 to 10))
    // weight 50 (in ln units) dwarfs any Gumbel draw — doc 77 is rank 1
    assert(once.head._2 === 77L)
  }

  test("dsirResample keys follow exp(weight): over many equal-weight " +
    "docs the selection is a uniform subset, not id-ordered") {
    import spark.implicits._
    val weighted = (0L until 1000L).map(i => (i, 0L))
      .toDF("doc_id", "weight_micro")
    val picked = Selection.dsirResample(weighted, k = 100)
      .collect().map(_.getLong(1)).toSet
    // a uniform 10% draw lands ~100 ids spread over the range; an
    // id-ordered or hash-degenerate pick would cluster
    assert(picked.count(_ < 500L) > 20 && picked.count(_ >= 500L) > 20,
      s"selection not spread: ${picked.toSeq.sorted.take(20)}")
  }

  test("keepAboveQuantile: exact drop-quantile threshold, ties keep, " +
    "dropPpm=0 keeps everything") {
    import spark.implicits._
    // scores 10,20,...,100; drop 30% -> threshold = 3rd smallest (30);
    // a tie at 30 keeps
    val scored = ((1L to 10L).map(i => (i, i * 10L)) :+ (11L, 30L))
      .toDF("doc_id", "score")
    val got = Selection.keepAboveQuantile(scored, "score", 300000L)
      .select($"doc_id", $"kept").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // N=11, k = ceil(11*0.3) = 4 -> threshold = 4th smallest = 30
    // (values sorted: 10,20,30,30,40,...) -> drops only 10 and 20
    assert(got(1L) === 0 && got(2L) === 0)
    assert((3L to 11L).forall(got(_) === 1), s"got $got")
    val all = Selection.keepAboveQuantile(scored, "score", 0L)
      .agg(sum($"kept")).first().getLong(0)
    assert(all === 11L, "dropPpm=0 must keep every row")
    val top = Selection.keepAboveQuantile(scored, "score", 1000000L)
      .filter($"kept" === 1).select($"score").collect().map(_.getLong(0))
    assert(top.toSeq === Seq(100L), "dropPpm=1e6 keeps only the max")
  }

  test("keepAboveQuantile rejects a non-integral score column instead " +
    "of silently truncating the threshold") {
    import spark.implicits._
    val doubles = Seq((1L, 0.4), (2L, 0.6)).toDF("doc_id", "score")
    val e = intercept[IllegalArgumentException] {
      Selection.keepAboveQuantile(doubles, "score", 500000L)
    }
    assert(e.getMessage.contains("integral"), e.getMessage)
    // int and long both satisfy the contract; drop 75% of N=2 ->
    // k = ceil(1.5) = 2 -> threshold 6 -> score 4 drops, 6 keeps (tie)
    for (cast <- Seq("int", "bigint")) {
      val ok = Selection.keepAboveQuantile(
        doubles.withColumn("score", ($"score" * 10).cast(cast)),
        "score", 750000L)
        .select($"doc_id", $"kept").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(ok === Map(1L -> 0, 2L -> 1))
    }
  }
}
