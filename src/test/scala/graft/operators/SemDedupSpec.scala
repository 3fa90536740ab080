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

  // ---- native nearest-centroid kernel vs the column spelling --------

  test("NearestCentroidsExpr: bit-identical to the generic column " +
    "spelling across id types, ties, and unroutable vectors") {
    import spark.implicits._
    val dim = 5
    // deterministic pseudo-random vectors (md5-derived, ~[-1.4, 1.4])
    def vec(seed: Int): Seq[Double] =
      (0 until dim).map(d =>
        (java.lang.Long.parseLong(
          java.security.MessageDigest.getInstance("MD5")
            .digest(s"v${seed}_$d".getBytes("UTF-8"))
            .take(6).map("%02x".format(_)).mkString, 16).toDouble
          / 1e14) - 1.4)
    val good: Seq[(Long, Seq[Double])] =
      (0 until 60).map(i => i.toLong -> vec(i)) :+
        // exactly equidistant (d=1e10 micro) to the two tie centroids
        // below, ~2x farther from every near-origin random centroid
        (1000L -> Seq(100.0, 100.0, 0.0, 0.0, 0.0))
    val df = good.toDF("id", "v")
      .unionByName(spark.range(1).select(lit(1001L).as("id"),
        expr("CAST(NULL AS ARRAY<DOUBLE>)").as("v")))
      .unionByName(spark.range(1).select(lit(1002L).as("id"),
        expr("array(1.0D, 2.0D)").as("v")))
      .unionByName(spark.range(1).select(lit(1003L).as("id"),
        expr("array(1.0D, CAST(NULL AS DOUBLE), 3.0D, 4.0D, 5.0D)").as("v")))

    val tie0: Seq[Double] = Seq(100.0, 0.0, 0.0, 0.0, 0.0)
    val tie1: Seq[Double] = Seq(0.0, 100.0, 0.0, 0.0, 0.0)
    def centsFor(ids: Seq[Any]): Seq[(Any, Seq[Double])] =
      ids.zipWithIndex.map { case (id, i) =>
        (id, if (i == 0) tie0 else if (i == 1) tie1 else vec(9000 + i))
      }
    def run(cents: Seq[(Any, Seq[Double])],
        f: (Seq[(Any, Seq[Double])], org.apache.spark.sql.Column) =>
          org.apache.spark.sql.Column): Seq[(Long, Any, String)] =
      df.select(col("id"), f(cents, col("v")).as("a"))
        .select(col("id"), col("a.d"), col("a.cl").cast("string"))
        .collect().map(r => (r.getLong(0),
          (if (r.isNullAt(1)) null else r.getLong(1)): Any,
          r.getString(2)))
        .sortBy(_._1).toSeq

    val cases: Seq[(Seq[Any], String)] = Seq(
      ((0 until 40).map(i => i: Any), "0"),
      ((0 until 40).map(i => (i * 7L + 3L): Any), "3"),
      ((0 until 40).map(i => s"cell_${"%02d".format(i)}": Any), "cell_00"))
    // large-k case: 300 centroids × dim 5 is past the size where the
    // column spelling used to fall out of codegen — the native path
    // must still match it bit for bit (the generic path stays cheap
    // enough to evaluate at this k on the 64-row input)
    val bigCases: Seq[(Seq[Any], String)] =
      Seq(((0 until 300).map(i => i: Any), "0"))
    for ((ids, tieWinner) <- cases ++ bigCases) {
      val cents = centsFor(ids)
      // deterministic shuffle: the native path must re-sort internally
      // to reproduce array_min's min-cl tie-break
      val shuffled = cents.indices
        .sortBy(i => ((i * 17) % cents.size, i)).map(cents)
      val got = run(shuffled, Similarity.nearestCentroidStruct)
      val want = run(shuffled, Similarity.nearestCentroidStructGeneric)
      assert(got === want, s"diverged for ids like ${ids.head}")
      assert(got.find(_._1 == 1000L).get._3 === tieWinner,
        "equidistant vector must take the smallest cluster id")
      for (bad <- Seq(1001L, 1002L, 1003L))
        assert(got.find(_._1 == bad).get._2 === null,
          s"row $bad must be unroutable (null d)")
    }
  }
}
