package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Honest-approximation characterization for the cell-probed ANN path:
  * measures recall@k of `CellIndex.topK` against the exact brute-force
  * top-k on the sf0.01 embeddings, across probe widths. The battery's
  * `q_ann_cell_topk` is configured so the probe returns the EXACT
  * answer (it shares the exact oracle); this spec is the complementary
  * evidence for the approximate regime a 100 TB deployment actually
  * runs in — few probes over many cells — where recall must degrade
  * gracefully and grow monotonically with nprobe (probing more cells
  * scans a superset of candidates; with the deterministic micro-BIGINT
  * ranking, a superset can only improve the cut).
  */
class CellIndexRecallSpec extends SparkSuite {

  private val sfDir = "/root/testdata/sf0.01"
  private val K = 5

  private def queriesDf: DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter($"vec_id" % 25 === 0) // 20 query vectors
      .select($"vec_id".as("query_id"),
        expr("CAST(embedding AS ARRAY<DOUBLE>)").as("qv"))
  }

  /** Exact top-K per query by the same micro-BIGINT cosine ranking the
    * index uses (self-match excluded). */
  private def exactTopK: Map[Long, Set[Long]] = {
    import spark.implicits._
    val cands = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"vec_id".as("cand_id"),
        expr("CAST(embedding AS ARRAY<DOUBLE>)").as("cv"))
    val w = Window.partitionBy($"query_id")
      .orderBy($"cos_sim_micro".desc, $"cand_id")
    queriesDf.crossJoin(cands)
      .filter($"query_id" =!= $"cand_id")
      .withColumn("cos_sim_micro", expr(
        s"CAST(round(${Similarity.cosineExpr("qv", "cv")} * 1000000) AS BIGINT)"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= K)
      .select($"query_id", $"cand_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) =>
        q -> rs.map(_.getLong(1)).toSet
      }
  }

  /** Exact top-K per query by micro-BIGINT SQUARED-L2 ranking — the
    * like-for-like baseline for PQ/ADC (which approximates L2 distance;
    * comparing it against the cosine baseline would conflate metric
    * mismatch with quantization loss). */
  private def exactL2TopK: Map[Long, Set[Long]] = {
    import spark.implicits._
    graft.functions.functions.register(spark)
    val cands = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"vec_id".as("cand_id"),
        expr("CAST(embedding AS ARRAY<DOUBLE>)").as("cv"))
    val w = Window.partitionBy($"query_id")
      .orderBy($"l2_micro".asc, $"cand_id")
    queriesDf.crossJoin(cands)
      .filter($"query_id" =!= $"cand_id")
      .withColumn("l2_micro", expr(
        "CAST(round((vector_dot(qv, qv) - 2 * vector_dot(qv, cv) + " +
          "vector_dot(cv, cv)) * 1000000) AS BIGINT)"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= K)
      .select($"query_id", $"cand_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) =>
        q -> rs.map(_.getLong(1)).toSet
      }
  }

  test("PQ/ADC recall@5 against exact L2: finer codebooks cut " +
    "quantization error and hold the recall floor") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // derive the query set from the same definition the exact baseline
    // uses — a second hardcoded list would silently deflate recall if
    // the fixture's vector count ever changes
    val qIds = queriesDf.select($"query_id").collect()
      .map(_.getLong(0)).toSeq
    val exact = exactL2TopK
    def run(m: Int, k: Int): (Double, Double) = {
      val books = Similarity.pqTrain(emb, m = m, k = k, iters = 2)
      val meanErr = Similarity.pqEncode(emb, books)
        .agg(avg($"err_micro")).head().getDouble(0)
      val got = Similarity.pqAdcTopK(emb, books, qIds, k = K)
        .select($"query_id", $"cand_id").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) =>
          q -> rs.map(_.getLong(1)).toSet
        }
      val recall = exact.map { case (q, want) =>
        got.getOrElse(q, Set.empty[Long]).count(want).toDouble / want.size
      }.sum / exact.size
      (recall, meanErr)
    }
    // capacity curve: 4×4 (2 bytes/vector) → 4×16 → 16×16 (8 bytes) on
    // a dim-64 corpus — quantization error must fall strictly, recall
    // must climb with it
    val curve = Seq((4, 4), (4, 16), (16, 16)).map { case (m, k) =>
      val (r, e) = run(m, k)
      info(f"ADC recall@$K m=$m%2d k=$k%2d -> $r%.3f (mean err $e%.0f)")
      (r, e)
    }
    curve.map(_._2).sliding(2).foreach { case Seq(a, b) =>
      assert(b < a, s"quantization error did not fall along the curve: $curve")
    }
    curve.map(_._1).sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a - 0.05, s"recall fell sharply along the curve: $curve")
    }
    // deterministic corpus + deterministic training ⇒ stable numbers;
    // the floors document the near-uniform-random WORST case for PQ
    // (no correlation structure to exploit — measured 0.10/0.14/0.34 at
    // pinning time, err 895k/739k/338k μ-units: capacity buys accuracy
    // even here). Real embedding corpora are far more compressible.
    assert(curve.last._1 >= 0.3,
      s"m=16 k=16 ADC recall ${curve.last._1} collapsed")
  }

  test("exact re-rank leg lifts IVF-PQ recall over pure ADC at equal " +
    "nprobe, and the float read is probe-pruned + candidate-bounded") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cellindex-rerank")
      .toString
    val index = new CellIndex(spark, dir)
    index.buildLearned(
      spark.read.parquet(s"$sfDir/embeddings.parquet"), k = 8)
    index.buildPq(m = 4, k = 16, iters = 2)
    // baseline = exact cosine restricted to the SAME probed cells
    // (index.topK): comparing rerank against the unrestricted exact
    // top-k would conflate probe misses (IVF's error) with ranking
    // misses (PQ's error); the re-rank leg can only fix the latter
    val nprobe = 4
    def sets(df: DataFrame): Map[Long, Set[Long]] =
      df.select($"query_id", $"cand_id").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) =>
          q -> rs.map(_.getLong(1)).toSet
        }
    val cellExact = sets(index.topK(queriesDf, k = K, nprobe = nprobe))
    def recall(got: Map[Long, Set[Long]]): Double =
      cellExact.map { case (q, want) =>
        got.getOrElse(q, Set.empty[Long]).count(want).toDouble / want.size
      }.sum / cellExact.size
    val adcOnly = recall(sets(index.topKPq(queriesDf, K, nprobe)))
    // recall is monotone in the shortlist width r: a wider shortlist is
    // a superset, and exact re-ranking of a superset can only keep more
    // of the truth. r = 300 exceeds the probed candidate count
    // (≤ 4/8 of 500), so the shortlist IS the probed set and the result
    // must equal the probed-cell exact top-k: recall exactly 1.
    val curve = Seq(K, 4 * K, 300).map { r =>
      r -> recall(sets(index.topKPqRerank(queriesDf, K, nprobe, r)))
    }
    info(f"recall@$K vs probed-cell exact: ADC $adcOnly%.3f, " +
      curve.map { case (r, v) => f"rerank(r=$r) $v%.3f" }.mkString(", "))
    curve.sliding(2).foreach { case Seq((rA, a), (rB, b)) =>
      assert(a <= b + 1e-9, s"recall fell from r=$rA to r=$rB")
    }
    assert(curve.head._2 >= adcOnly - 1e-9,
      s"re-ranking lost recall: adc=$adcOnly curve=$curve")
    assert(curve.exists(_._2 > adcOnly),
      s"re-ranking never improved on pure ADC: adc=$adcOnly curve=$curve")
    assert(curve.last._2 === 1.0,
      s"full-width re-rank did not recover the probed-cell exact top-k: $curve")
    // the exact leg reads floats candidate-bounded: the vectors scan is
    // partition-pruned to probed cells and the shortlist is broadcast
    val plan = index.topKPqRerank(queriesDf, K, nprobe, rerank = 4 * K)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell#") ||
      plan.contains("PartitionFilters: [isnotnull(cell"),
      s"float scan not partition-pruned:\n$plan")
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      "shortlist not broadcast against the float scan")
  }

  test("cell-probe recall@5 grows monotonically with nprobe and is exact " +
    "at full probe width") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cellindex-recall")
      .toString
    val index = new CellIndex(spark, dir)
    // 16 learned cells over 500 vectors: small enough that nprobe=16 is
    // a full scan, large enough that nprobe=1 genuinely misses
    index.buildLearned(
      spark.read.parquet(s"$sfDir/embeddings.parquet"), k = 16)
    val exact = exactTopK
    val nQueries = exact.size
    def recallAt(nprobe: Int): Double = {
      val got = index.topK(queriesDf, k = K, nprobe = nprobe)
        .select($"query_id", $"cand_id").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) =>
          q -> rs.map(_.getLong(1)).toSet
        }
      exact.map { case (q, want) =>
        got.getOrElse(q, Set.empty[Long]).count(want).toDouble / want.size
      }.sum / nQueries
    }
    val curve = Seq(1, 2, 4, 16).map(np => np -> recallAt(np))
    info(s"recall@$K curve: " + curve.map { case (np, r) =>
      f"nprobe=$np%2d -> $r%.3f" }.mkString(", "))
    // monotone: more probes never lose a true neighbor
    curve.sliding(2).foreach { case Seq((npA, a), (npB, b)) =>
      assert(a <= b + 1e-9, s"recall fell from nprobe=$npA to $npB")
    }
    // full probe width IS the brute-force scan: recall must be exactly 1
    assert(curve.last._2 === 1.0)
    // floor for the approximate regime. The synthetic embeddings are
    // near-uniform random — the WORST case for IVF (cell membership
    // barely predicts cosine neighborhoods) — so these bounds document
    // graceful degradation on hostile data, not clustered-data
    // performance: measured 0.28 / 0.57 at pinning time (deterministic
    // corpus + deterministic k-means ⇒ stable numbers). Real embedding
    // corpora are clustered, which is the regime IVF exists for.
    assert(curve.head._2 >= 0.25,
      s"nprobe=1 recall ${curve.head._2} collapsed below the uniform-data floor")
    assert(curve(2)._2 >= 0.5,
      s"nprobe=4 recall ${curve(2)._2} collapsed below the uniform-data floor")
  }
}
