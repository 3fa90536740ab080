package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (`Array[Float]`, dim 64).
  *
  * Cosine is computed with the native codegen'd `vector_dot` expression
  * (`graft.functions.DotProductExpr`) after casting to double — its
  * sequential left-to-right summation matches both the interpreted
  * `aggregate(zip_with(...))` spelling and DuckDB's list functions
  * bit-for-bit, without the per-pair array allocation. Similarities
  * are emitted as micro-scaled BIGINT (`round(sim * 1e6)`): a scale-0
  * round of an identically-computed double is byte-stable across engines,
  * whereas double/decimal outputs are not.
  *
  * Scale path: the brute-force top-k broadcasts the (small) query set and
  * computes partial top-k per partition (TakeOrderedAndProject after a
  * broadcast nested loop) — at 100 TB the same plan holds with the query
  * side broadcast and the corpus scanned once; the threshold-pair query is
  * blocked on `label` (an IVF-style coarse quantization) so it is an
  * equi-join, not a cross product.
  */
object VectorQueries {

  private def emb(s: SparkSession, dir: String): DataFrame = {
    graft.functions.functions.register(s)
    Tables.read(s, dir, "embeddings")
  }

  /** embedding as double array + precomputed L2 norm. */
  private def embNorm(s: SparkSession, dir: String): DataFrame =
    emb(s, dir)
      .withColumn("v", expr("CAST(embedding AS ARRAY<DOUBLE>)"))
      .withColumn("norm", expr("sqrt(vector_dot(v, v))"))

  private val DotExpr = "vector_dot(qv, cv)"

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
        .orderBy($"cos_sim_micro".desc, $"cand_id")
      c.join(broadcast(q), $"query_id" =!= $"cand_id")
        .withColumn("cos_sim_micro", expr(
          s"CAST(round($DotExpr / (qnorm * cnorm) * 1000000) AS BIGINT)"))
        .withColumn("rank", row_number().over(w))
        .filter($"rank" <= 5)
        .select($"query_id", $"cand_id", $"rank", $"cos_sim_micro")
        .orderBy($"query_id", $"rank")
    }),

    // near-duplicate pairs by cosine threshold, blocked on label
    // (embedding-cosine near-dup dedup) — via the hot-label-guarded
    // operator: labels under the cap (all of them on this data) compare
    // exactly, so the oracle stays bit-exact; an oversized label would be
    // LSH-sub-bucketed instead of going quadratic
    "q_cosine_dup_pairs" -> ((s, dir) => {
      import s.implicits._
      graft.operators.Similarity.cosineDupPairs(emb(s, dir))
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
          sum(expr("CAST(round(norm * 1000000) AS BIGINT)"))
            .as("sum_norm_micro"))
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
      """SELECT query_id, cand_id, rank, cos_sim_micro
        |FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
        |    CAST(round(list_inner_product(q.v, c.v) / (q.norm * c.norm)
        |               * 1000000) AS BIGINT) AS cos_sim_micro,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY CAST(round(list_inner_product(q.v, c.v) / (q.norm * c.norm)
        |               * 1000000) AS BIGINT) DESC,
        |               c.vec_id) AS rank
        |  FROM base q JOIN base c ON q.vec_id <> c.vec_id
        |  WHERE q.vec_id < 5)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin),

    "q_cosine_dup_pairs" -> (BaseCte +
      """SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label,
        |  CAST(round(list_inner_product(a.v, b.v) / (a.norm * b.norm)
        |       * 1000000) AS BIGINT) AS cos_sim_micro
        |FROM base a JOIN base b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE CAST(round(list_inner_product(a.v, b.v) / (a.norm * b.norm)
        |      * 1000000) AS BIGINT) > 300000
        |ORDER BY vec_a, vec_b""".stripMargin),

    "q_label_centroid_stats" -> (BaseCte +
      """SELECT label, count(*) AS n_vectors, min(vec_id) AS min_vec_id,
        |  max(vec_id) AS max_vec_id,
        |  CAST(sum(CAST(round(norm * 1000000) AS BIGINT)) AS BIGINT)
        |    AS sum_norm_micro
        |FROM base GROUP BY label ORDER BY label""".stripMargin))
}
