package graft.tools

import org.apache.spark.sql.SparkSession

/** Three-rung scaling ladder for the pair/join battery family
  * (VERDICT r12 #3): two points (sf0.01 vs sf0.1) fit a straight line
  * through ANY polynomial — a quadratic candidate generator reads as
  * "ratio 2.3, fine" on one step and only shows its curve on the next.
  * This main measures each query at sf0.01 (500 docs), sf0.1 (5 000),
  * and a synthetic ×`SPARK_GRAFT_LADDER_MULT` (default 10 → 50 000
  * docs, [[graft.Profile.buildSynthetic]]'s construction: duplication
  * density constant, volume scaled), then fits a per-leg scaling
  * exponent p = ln(t₂/t₁) / ln(n₂/n₁) against the DRIVING table's real
  * row counts (documents vs embeddings — they scale differently across
  * the driver's dirs). A query whose top-leg exponent exceeds
  * [[SuperLinear]] is named with its term in the output — the empirical
  * tripwire that would have caught the r12 jaccardPairs stopword
  * quadratic (VERDICT r12 finding #1) without a code audit.
  *
  * Small-rung exponents undershoot (fixed overhead dominates 500-doc
  * runs); the TOP leg (5 000 → 50 000+) is the graded signal. Output:
  * one `LADDER` line per (query, rung), one `LADDER-FIT` line per
  * query, and a closing JSON summary. PROFILE.md holds the analysis. */
object Ladder {

  /** The laddered battery (r14 widens the original pair/join family
    * with the sketch, curation-gate, ANN/index-probe, and archive
    * families — VERDICT r13 #4: "cost independent of corpus by design"
    * was asserted for probes and sketches, not laddered). Each entry
    * names the table whose row count is the scaling denominator.
    *
    * Expected top-leg shapes: pair/join families ≤ ~1.0
    * (candidate/output-proportional); single-scan families ~≤ 1.0
    * (sketch builds, gates, decontamination scan the corpus once);
    * probe families well under (the probed-cell / banded-posting read
    * is bounded by the batch, not the corpus — only the warm pass pays
    * the per-dir index build). */
  private val Family: Seq[(String, String)] = Seq(
    // pair/join family — candidate volume is the hazard
    "q_ngram_jaccard" -> "documents", // prefix-filtered jaccard (r13 fix)
    "q_dedup_clusters" -> "documents", // jaccard edges -> pointer-jumping CC
    "q_canonical_select" -> "documents", // cluster table + argmax join
    "q_simhash_pairs" -> "documents", // banded simhash self-join
    "q_minhash_lsh_pairs" -> "documents", // banded minhash self-join
    "q_winnow_pairs" -> "documents", // winnow fingerprint self-join
    "q_edit_distance" -> "documents", // banded candidates + bounded confirm
    "q_semdedup" -> "embeddings", // cluster-blocked cosine pairs
    "q_cosine_dup_pairs" -> "embeddings", // hot-label-guarded cosine pairs
    "q_pagerank" -> "documents", // broadcast-round rank over jaccard edges
    "q_banding_recall" -> "documents", // sampled-truth recall harness (r13)
    "q_banding_curve" -> "documents", // 3-config tuning sweep (r14)
    // sketch family — one corpus scan in, constant-size state out
    "q_hll_store" -> "documents", // two loads into a SketchStore + union
    "q_hll_union" -> "documents", // register-wise max merge
    "q_cms_merge" -> "documents", // register-wise sum merge
    "q_kmv_estimate" -> "documents", // k-min-values distinct estimate
    // curation-gate family — map-side rules + small aggregates
    "q_quality_gate" -> "documents",
    "q_score_gate" -> "documents", // char-LM scoring, 2 corpus passes
    "q_bloom_decontaminate" -> "documents", // broadcast Bloom prefilter
    // ANN/index-probe family — reads bounded by probes, not corpus
    "q_ann_ivf_topk" -> "embeddings", // full-scan IVF variant (linear)
    "q_ann_cell_topk" -> "embeddings", // partition-pruned probed cells
    "q_ann_pq_rerank_topk" -> "embeddings", // ADC shortlist + exact re-rank
    "q_neardup_probe" -> "documents", // banded postings probe vs history
    // archive family — pushed-filter scans + TakeOrdered pages
    "q_time_interval" -> "events",
    "q_cursor_page" -> "events")

  /** Top-leg exponent above which a query is flagged by name: 1.0 is
    * linear, candidate/pair families legitimately run slightly above
    * map-pass exponents on small corpora, quadratic is 2.0. 1.3 catches
    * a quadratic term long before it dominates while tolerating
    * fixed-overhead noise. */
  val SuperLinear = 1.3

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val mult = sys.env.getOrElse("SPARK_GRAFT_LADDER_MULT", "10").toInt
    val rung2 = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rung1 = sys.env.getOrElse("SPARK_GRAFT_SF_DIR_SMALL",
      "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.functions.register(spark)
    spark.range(1000000).selectExpr("sum(id)").collect() // JVM warmup

    val rung3 = graft.Profile.buildSynthetic(spark, rung2, mult)
    // quiesce after the synthetic build (see Profile.main: async cleaner
    // work otherwise lands inside the first measured query)
    spark.range(1000000).selectExpr("sum(id)").collect()
    System.gc()
    Thread.sleep(3000)

    val names =
      if (args.nonEmpty) Family.filter(f => args.contains(f._1)) else Family
    val rungs = Seq(rung1, rung2, rung3)
    val rowCount = scala.collection.mutable.Map.empty[(String, String), Long]
    def rowsOf(dir: String, table: String): Long =
      rowCount.getOrElseUpdate((dir, table),
        spark.read.parquet(s"$dir/$table.parquet").count())

    def run(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.mode("overwrite").format("noop").save()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.catalog.clearCache()
      sec
    }

    val samples = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_LADDER_RUNS", "2").toInt)
    val fits = for ((name, table) <- names) yield {
      val times = for (dir <- rungs) yield {
        // warm pass per (query, dir): plan compilation lands on rung 1,
        // per-dir one-time artifact builds (jaccardEdgesCache,
        // clusterTableCache) land in each rung's warm pass — measured
        // runs see steady state, so the curve is pure data scaling.
        // best-of-N measured runs (the Bench discipline): a single
        // sample under an external-contention window bends the fitted
        // exponent — observed 4.5x on one rung vs the bench's
        // best-of-2 for the same query
        run(name, dir)
        val sec = (1 to samples).map(_ => run(name, dir)).min
        val n = rowsOf(dir, table)
        println(f"LADDER q=$name dir=$dir rows=$n sec=$sec%.2f")
        (n, sec)
      }
      val legs = times.sliding(2).collect {
        case Seq((n1, t1), (n2, t2)) if n2 > n1 && t1 > 0 =>
          math.log(t2 / t1) / math.log(n2.toDouble / n1)
      }.toSeq
      val top = legs.lastOption.getOrElse(Double.NaN)
      val flag = if (top > SuperLinear) " SUPERLINEAR" else ""
      println(f"LADDER-FIT q=$name exponents=${
        legs.map(l => f"$l%.2f").mkString(",")} top=$top%.2f$flag")
      (name, times, legs)
    }

    val qjson = fits.map { case (n, times, legs) =>
      s""""$n":{"rungs":${times.map { case (r, t) =>
        s"""{"rows":$r,"sec":${f"$t%.3f"}}""" }.mkString("[", ",", "]")},""" +
        s""""exponents":${legs.map(l => f"$l%.3f").mkString("[", ",", "]")}}"""
    }.mkString("{", ",", "}")
    val worst = fits.flatMap { case (n, _, legs) =>
      legs.lastOption.map(n -> _) }.sortBy(-_._2)
    println(s"""{"metric":"ladder","mult":$mult,"queries":$qjson,""" +
      s""""worst_top_leg":${worst.headOption.map { case (n, e) =>
        s"""{"q":"$n","exponent":${f"$e%.3f"}}""" }.getOrElse("null")}}""")
    spark.stop()
  }
}
