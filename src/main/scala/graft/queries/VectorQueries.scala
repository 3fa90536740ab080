package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (`Array[Float]`, dim 64).
  *
  * Cosine is computed with builtin higher-order functions (`zip_with` +
  * `aggregate`) after casting to double — sequential left-to-right
  * summation matches DuckDB's list functions bit-for-bit, and results are
  * rounded to 4 decimals before ranking for cross-engine determinism.
  *
  * Scale path: the brute-force top-k broadcasts the (small) query set and
  * computes partial top-k per partition (TakeOrderedAndProject after a
  * broadcast nested loop) — at 100 TB the same plan holds with the query
  * side broadcast and the corpus scanned once; the threshold-pair query is
  * blocked on `label` (an IVF-style coarse quantization) so it is an
  * equi-join, not a cross product.
  */
object VectorQueries {

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.read(s, dir, "embeddings")

  /** embedding as double array + precomputed L2 norm. */
  private def embNorm(s: SparkSession, dir: String): DataFrame =
    emb(s, dir)
      .withColumn("v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .withColumn("norm", expr(
        "sqrt(aggregate(zip_with(v, v, (x, y) -> x * y), 0D, (acc, x) -> acc + x))"))

  private val DotExpr =
    "aggregate(zip_with(qv, cv, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // brute-force cosine top-5 for a fixed query set (ANN baseline)
    "q_cosine_topk" -> ((s, dir) => {
      import s.implicits._
      val base = embNorm(s, dir)
      val q = base.filter($"vec_id" < 5)
        .select($"vec_id".as("query_id"), $"v".as("qv"), $"norm".as("qnorm"))
      val c = base
        .select($"vec_id".as("cand_id"), $"v".as("cv"), $"norm".as("cnorm"))
      val w = Window.partitionBy($"query_id")
        .orderBy($"cos_sim".desc, $"cand_id")
      c.join(broadcast(q), $"query_id" =!= $"cand_id")
        .withColumn("cos_sim",
          round(expr(DotExpr) / ($"qnorm" * $"cnorm"), 4))
        .withColumn("rank", row_number().over(w))
        .filter($"rank" <= 5)
        .select($"query_id", $"cand_id", $"rank",
          $"cos_sim".cast("decimal(9,4)").as("cos_sim"))
        .orderBy($"query_id", $"rank")
    }),

    // near-duplicate pairs by cosine threshold, blocked on label
    // (embedding-cosine near-dup dedup)
    "q_cosine_dup_pairs" -> ((s, dir) => {
      import s.implicits._
      val base = embNorm(s, dir)
      val a = base.select($"vec_id".as("vec_a"), $"label",
        $"v".as("qv"), $"norm".as("qnorm"))
      val b = base.select($"vec_id".as("vec_b"), $"label",
        $"v".as("cv"), $"norm".as("cnorm"))
      a.join(b, Seq("label"))
        .filter($"vec_a" < $"vec_b")
        .withColumn("cos_sim",
          round(expr(DotExpr) / ($"qnorm" * $"cnorm"), 4))
        .filter($"cos_sim" > 0.3)
        .select($"vec_a", $"vec_b", $"label",
          $"cos_sim".cast("decimal(9,4)").as("cos_sim"))
        .orderBy($"vec_a", $"vec_b")
    }),

    // centroid stats per label: the "coarse quantizer" side of an IVF
    // index — mean vector norms and counts per cell
    "q_label_centroid_stats" -> ((s, dir) => {
      import s.implicits._
      embNorm(s, dir)
        .groupBy($"label")
        .agg(count(lit(1)).as("n_vectors"),
          min($"vec_id").as("min_vec_id"),
          max($"vec_id").as("max_vec_id"),
          sum($"norm".cast("decimal(18,6)")).cast("decimal(18,6)")
            .as("sum_norm"))
        .orderBy($"label")
    }))

  private val BaseCte =
    """WITH base AS (
      |  SELECT vec_id, label, embedding::DOUBLE[] AS v,
      |         sqrt(list_inner_product(embedding::DOUBLE[],
      |                                 embedding::DOUBLE[])) AS norm
      |  FROM embeddings)
      |""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_cosine_topk" -> (BaseCte +
      """SELECT query_id, cand_id, rank, CAST(cos_sim AS DECIMAL(9,4)) AS cos_sim
        |FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
        |    round(list_inner_product(q.v, c.v) / (q.norm * c.norm), 4) AS cos_sim,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY round(list_inner_product(q.v, c.v) / (q.norm * c.norm), 4) DESC,
        |               c.vec_id) AS rank
        |  FROM base q JOIN base c ON q.vec_id <> c.vec_id
        |  WHERE q.vec_id < 5)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin),

    "q_cosine_dup_pairs" -> (BaseCte +
      """SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label,
        |  CAST(round(list_inner_product(a.v, b.v) / (a.norm * b.norm), 4)
        |       AS DECIMAL(9,4)) AS cos_sim
        |FROM base a JOIN base b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE round(list_inner_product(a.v, b.v) / (a.norm * b.norm), 4) > 0.3
        |ORDER BY vec_a, vec_b""".stripMargin),

    "q_label_centroid_stats" -> (BaseCte +
      """SELECT label, count(*) AS n_vectors, min(vec_id) AS min_vec_id,
        |  max(vec_id) AS max_vec_id,
        |  CAST(sum(CAST(norm AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS sum_norm
        |FROM base GROUP BY label ORDER BY label""".stripMargin))
}
