package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class SemDedupSpec extends SparkSuite {

  private def emb(rows: (Long, Array[Float])*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  private def keptMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap

  test("exact duplicate vectors: lowest id survives, copies dropped") {
    val e = emb(
      0L -> Array(1f, 0f, 0f, 0f),
      1L -> Array(0f, 1f, 0f, 0f),
      100L -> Array(1f, 0f, 0f, 0f), // dup of 0
      101L -> Array(1f, 0f, 0f, 0f)) // dup of 0 and 100
    val kept = keptMap(
      Similarity.semanticDedup(e, k = 1, iters = 1, dim = 4))
    assert(kept === Map(0L -> true, 1L -> true, 100L -> false,
      101L -> false))
  }

  test("scaled copies (paraphrase proxy) are cosine-1 and dropped; " +
    "orthogonal vectors all survive") {
    val e = emb(
      0L -> Array(1f, 0f, 0f, 0f),
      1L -> Array(0f, 1f, 0f, 0f),
      2L -> Array(0f, 0f, 1f, 0f),
      3L -> Array(3f, 0f, 0f, 0f)) // parallel to 0, different norm
    val kept = keptMap(
      Similarity.semanticDedup(e, k = 1, iters = 1, dim = 4))
    assert(kept === Map(0L -> true, 1L -> true, 2L -> true, 3L -> false))
  }

  test("min-id rule is not transitive-closure: a vector is dropped iff " +
    "it has a lower-id similar mate, survivor or not") {
    // a ~ b, b ~ c, a !~ c (chain): b dropped by a; c dropped by b even
    // though b itself is dropped — the paper's greedy one-per-group,
    // deterministic under corpus growth
    val e = emb(
      0L -> Array(1f, 0f, 0f, 0f),
      1L -> Array(0.9f, 0.436f, 0f, 0f), // cos(0,1) ~ .90, cos(1,2) ~ .88
      2L -> Array(0.6f, 0.8f, 0f, 0f),   // cos(0,2) = .60 < threshold .7
      3L -> Array(0f, 0f, 1f, 0f))
    val kept = keptMap(Similarity.semanticDedup(
      e, k = 1, iters = 1, thresholdMicro = 700000L, dim = 4))
    assert(kept === Map(0L -> true, 1L -> false, 2L -> false, 3L -> true))
  }

  test("every input vector gets exactly one output row, guard on or off") {
    val vecs = (0L until 40L).map(i =>
      i -> Array(math.cos(i / 7.0).toFloat, math.sin(i / 7.0).toFloat,
        (i % 5).toFloat / 4f, 1f))
    val e = emb(vecs: _*)
    val exact = Similarity.semanticDedup(e, k = 2, iters = 1, dim = 4)
    assert(exact.count() === 40L)
    assert(exact.select("vec_id").distinct().count() === 40L)
    // force the hot-cluster guard: every cluster is over the cap, so
    // pairs are LSH-sub-bucketed — still one row per vector, and the
    // guard can only LOSE pairs, so it never drops more than exact
    val guarded = Similarity.semanticDedup(
      e, k = 2, iters = 1, maxBlock = 5L, subBits = 2, dim = 4)
    assert(guarded.count() === 40L)
    val exactDropped = exact.filter(!col("is_kept")).count()
    val guardedDropped = guarded.filter(!col("is_kept")).count()
    assert(guardedDropped <= exactDropped,
      s"guard dropped $guardedDropped > exact $exactDropped")
  }

  test("cluster blocking misses cross-cluster dups by design (the " +
    "SemDeDup trade) — same-cluster dups are still caught") {
    // two tight groups far apart; the deterministic seeding takes the
    // first k vectors by id as initial centroids, so ids 0 and 1 are
    // one per group and Lloyd separates them cleanly. The within-group
    // dups (ids 2, 3) must be caught inside their clusters
    val e = emb(
      0L -> Array(1f, 0f, 0f, 0f),
      1L -> Array(0f, 0f, 1f, 0f),
      2L -> Array(1f, 0.01f, 0f, 0f), // near-dup of 0
      3L -> Array(0f, 0.01f, 1f, 0f)) // near-dup of 1
    val kept = keptMap(Similarity.semanticDedup(
      e, k = 2, iters = 2, thresholdMicro = 900000L, dim = 4))
    assert(kept(0L) === true)
    assert(kept(1L) === true)
    assert(kept(2L) === false)
    assert(kept(3L) === false)
  }
}
