package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data selection via importance resampling (DSIR, Xie et al. 2023):
  * score every document by how much more likely its hashed n-gram
  * features are under a small TARGET distribution (the data you want
  * more of — curated wiki, a target language) than under the raw SOURCE
  * distribution, then sample/filter by that weight.
  *
  * Features are unigrams hashed into `buckets` cells with the same
  * md5-prefix integer hash the [[Cms]]/[[Hll]] sketches use, so the
  * feature space is fixed-size regardless of vocabulary, and the whole
  * computation is oracle-checkable:
  *
  *   bucket(t)    = md5_60(t) mod B
  *   lr_micro(b)  = round(ln( ((ct_b+1)·(tS+B)) / ((cs_b+1)·(tT+B)) )·1e6)
  *                  — add-one-smoothed log-likelihood ratio of bucket b,
  *                  target over source: exact BIGINT products, ONE
  *                  double division into ln, ONE rounding to micro
  *                  BIGINT (the `q_tfidf_top_terms` ln discipline)
  *   weight_micro(doc) = Σ_b n_b(doc) · lr_micro(b)
  *                  — integer products and sums from there on, so the
  *                  aggregate is order-independent and bit-stable
  *
  * A positive weight means "looks more like the target than the source".
  * Resampling keeps documents with probability ∝ exp(weight) — the
  * deterministic md5-uniform draw of [[Curation.stratifiedSample]]
  * composes directly (`md5_uniform(doc_id) < exp(weight - max)`), so no
  * RNG state is needed; this object only computes the weights, which is
  * the part with a distribution in it.
  *
  * 100 TB shape: the model is TWO aggregates over the exploded corpus
  * (per-bucket target and source counts — partial-agg friendly, output
  * exactly B rows) broadcast back into one per-doc aggregate; the corpus
  * shuffles once on (doc, bucket) after map-side combine. No pairwise
  * anything, no driver-side iteration; B is a constant (256) chosen to
  * keep the broadcast trivial.
  */
object Selection {

  /** Fixed hashed-feature space; DSIR's paper uses 10k for web corpora,
    * 256 keeps the whole model auditable in a battery row budget while
    * exercising the identical plan. */
  val Buckets = 256

  /** 60-bit integer hash both engines compute identically ([[Cms]]). */
  private def h60(value: Column): Column =
    conv(substring(md5(value), 1, 15), 16, 10).cast("long")

  /** Whitespace tokenization shared with the vocab/token-count queries:
    * the explicit class because \s differs between Java regex and RE2
    * on U+000B. */
  private def tokens(textCol: String): Column =
    split(lower(trim(col(textCol))), "[ \\t\\n\\x0B\\f\\r]+")

  /** Per-document DSIR importance weight against a target predicate.
    *
    * @param docs      corpus with `idCol` and `textCol`
    * @param isTarget  boolean column marking the target slice (e.g.
    *                  `col("lang") === "en"`); the source distribution
    *                  is everything else
    * @return one row per doc:
    *         (idCol, n_tokens, weight_micro, is_target)
    */
  def dsirWeights(
      docs: DataFrame,
      isTarget: Column,
      textCol: String = "text",
      idCol: String = "doc_id",
      buckets: Int = Buckets): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    // explode_OUTER over the pre-filtered token array: a doc with zero
    // tokens (empty/whitespace text) keeps ONE null-token row, so the
    // "@return one row per doc" contract holds — it emits an explicit
    // (n_tokens=0, weight_micro=0) row instead of silently vanishing
    // from the output (and from any dsirResample ranking downstream).
    // Null-token rows never reach the model counts and join nothing.
    val grams = docs
      .select(col(idCol), isTarget.as("__t"),
        explode_outer(filter(tokens(textCol),
          t => length(t) > 0)).as("__tok"))
      .withColumn("__b", pmod(h60(col("__tok")), lit(buckets.toLong)))

    // the model: per-bucket counts under each distribution + totals,
    // all exact integers. Two hash aggregates, B rows out.
    val counts = grams
      .filter(col("__tok").isNotNull)
      .groupBy(col("__b"))
      .agg(sum(when(col("__t"), 1L).otherwise(0L)).as("__ct"),
        sum(when(col("__t"), 0L).otherwise(1L)).as("__cs"))
    val totals = counts.agg(sum(col("__ct")).as("__tT"),
      sum(col("__cs")).as("__tS"))
    val model = counts.crossJoin(broadcast(totals))
      .select(col("__b"),
        // numerator and denominator stay exact BIGINT products; ONE
        // double division feeds ln, ONE rounding emits the micro
        // BIGINT. (Spelling (__ct + 1.0) would parse the literal as
        // DECIMAL in Spark SQL and push the whole ratio through
        // decimal arithmetic — measured 1.5e-7 relative error vs the
        // oracle's double path.)
        round(expr(
          s"ln(CAST((__ct + 1) * (__tS + $buckets) AS DOUBLE) / " +
            s"CAST((__cs + 1) * (__tT + $buckets) AS DOUBLE)) * 1000000"))
          .cast("long").as("__lr"))

    grams
      .groupBy(col(idCol), col("__t"), col("__b"))
      .agg(sum(when(col("__tok").isNotNull, 1L).otherwise(0L)).as("__n"))
      .join(broadcast(model), Seq("__b"), "left")
      .groupBy(col(idCol), col("__t"))
      .agg(sum(col("__n")).as("n_tokens"),
        sum(col("__n") * coalesce(col("__lr"), lit(0L))).as("weight_micro"))
      .select(col(idCol), col("n_tokens"), col("weight_micro"),
        col("__t").as("is_target"))
  }

  /** The resampling half of DSIR: select `k` documents WITHOUT
    * replacement with probability ∝ exp(weight) via Gumbel-top-k
    * (Vieira 2014) — key = weight + Gumbel noise, take the k largest.
    * The Gumbel draw is `-ln(-ln(u))` with `u` a DETERMINISTIC
    * md5-uniform of the id (the [[Curation.stratifiedSample]]
    * discipline: no RNG state, so retries, incremental loads and both
    * engines agree row-for-row; `u = (md5_60(id) + 1) / (2^60 + 1)`
    * can never hit 0 or 1, so the key is always finite).
    *
    * Scale shape: pure map-side key computation + top-k
    * (TakeOrderedAndProject — k rows to the driver, never a global
    * sort).
    *
    * @param weighted output of [[dsirWeights]] (or anything with
    *                 `idCol` + `weightCol` in micro units)
    * @return (rank, idCol, weightCol), rank 1..k by descending key
    */
  def dsirResample(
      weighted: DataFrame,
      k: Int,
      idCol: String = "doc_id",
      weightCol: String = "weight_micro"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // integer add BEFORE the double cast; double literals via CAST
    // (a bare 1000000.0 parses as DECIMAL in Spark SQL — the
    // dsirWeights lesson)
    val key = expr(
      s"""CAST($weightCol AS DOUBLE) / CAST(1000000 AS DOUBLE)
         | - ln(-ln(
         |     (CAST(conv(substring(md5(CAST($idCol AS STRING)), 1, 15),
         |           16, 10) AS BIGINT) + CAST(1 AS DOUBLE))
         |     / CAST(1152921504606846977 AS DOUBLE)))""".stripMargin)
    weighted
      .withColumn("__key", key)
      .orderBy(col("__key").desc, col(idCol))
      .limit(k)
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("__key").desc, col(idCol))))
      .select(col("rank"), col(idCol), col(weightCol))
  }

  /** Quantile-gated selection — "keep the best (1M − dropPpm)/1M of the
    * corpus by this score": the keep flag compares each row's score to
    * the EXACT ⌈N·dropPpm/1e6⌉-th smallest score, computed by
    * [[Quantiles.exactKth]]'s bucket-and-refine pass (no whole-corpus
    * sort task). Ties at the threshold KEEP, so re-running over a grown
    * corpus can re-admit borderline rows but never produces a
    * nondeterministic split of equal scores; the threshold itself is an
    * exact order statistic, bit-stable in any engine that replays the
    * same integer scores. The dynamic-threshold companion to the fixed
    * thresholds of [[graft.operators.Curation.qualityGate]] — "drop the
    * worst 10%" instead of "drop below X".
    *
    * Scale shape: one histogram aggregate + small-bucket refine for the
    * threshold (a 1-row broadcast), then a map-side flag — the corpus
    * never shuffles.
    *
    * @param scored any frame with an integral `scoreCol`
    * @return input columns + `kept` (1 = score ≥ the drop quantile) */
  def keepAboveQuantile(
      scored: DataFrame,
      scoreCol: String,
      dropPpm: Long): DataFrame = {
    require(dropPpm >= 0 && dropPpm <= 1000000L,
      s"dropPpm in [0, 1000000], got $dropPpm")
    require(!scored.columns.contains("__all") &&
      !scored.columns.contains("__thr"),
      "input collides with a keepAboveQuantile working column")
    // fail fast on a non-integral score (ADVICE r11): the threshold is
    // cast("long") before the compare, so a double column would silently
    // TRUNCATE it and keep rows strictly below the true quantile —
    // enforce exactKth's documented integral contract instead
    val scoreType = scored.schema(scoreCol).dataType
    require(Seq(org.apache.spark.sql.types.ByteType,
      org.apache.spark.sql.types.ShortType,
      org.apache.spark.sql.types.IntegerType,
      org.apache.spark.sql.types.LongType).contains(scoreType),
      s"keepAboveQuantile needs an integral score column (the exactKth " +
        s"contract; micro-scale fractional scores first — the charLmScore " +
        s"discipline): $scoreCol is $scoreType")
    // PIN the scored frame and flag over the PIN (r17; guide §1.2 —
    // don't compute things twice): the scorer runs exactly ONCE, into
    // the pin; exactKth's two reads (histogram chain + refine join) and
    // the caller's materialization all read pinned blocks. The previous
    // persist/unpersist spelling avoided a cache leak but paid the
    // scorer TWICE — once materializing the cache for the threshold and
    // once more when the caller materialized the returned (unpersisted)
    // plan; for the char-LM scorer that second pass was the single
    // biggest job in q_score_gate (QueryJobs r17: 2.3 s of 7.1). The
    // pin rides the returned frame the way jaccardSelfJoin's result pin
    // does, result-sized at one row of 4 integers per document. Release:
    // the harnesses' per-query getPersistentRDDs unpersist-all (Bench,
    // Verify) or ContextCleaner GC of the returned frame —
    // spark.catalog.clearCache() alone does NOT free localCheckpoint
    // blocks (ADVICE r17). If the threshold computation throws, the pin
    // is released here instead of stranding until GC.
    val s = Checkpoints.pin(scored)
    val thrValue =
      try Quantiles.exactKth(
        s.withColumn("__all", lit(0)), "__all", scoreCol,
        Seq("q" ->
          expr(s"greatest(1L, (__n * $dropPpm + 999999) div 1000000)")))
        .select(col("value").cast("long")).take(1)
        .headOption.map(_.getLong(0))
        // empty input has no order statistic — and no rows to flag;
        // MinValue keeps the (vacuous) "ties keep" shape
        .getOrElse(Long.MinValue)
      catch { case e: Throwable => Checkpoints.release(s); throw e }
    s.withColumn("kept",
      when(col(scoreCol) >= lit(thrValue), 1).otherwise(0))
  }
}
