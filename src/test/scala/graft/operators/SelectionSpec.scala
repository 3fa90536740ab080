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
}
