package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Self-scaled stress profile: sf0.1 is ~17 MB — far too small to stress
  * 32 cores — so this main synthetically multiplies the corpus
  * `SPARK_GRAFT_PROFILE_MULT`× (default 64, ~1 GB working set) and runs
  * the iterative/pair-heavy battery queries on BOTH the base and the
  * multiplied corpus, recording wall seconds and total shuffle
  * read/write bytes per query. The ratio pair (time×, shuffle×) against
  * the corpus multiplier is the scaling curve: a query whose shuffle
  * grows ~linearly with the corpus at a near-constant bytes-per-row is
  * shaped right for 100 TB; a superlinear jump flags a pair-explosion
  * or a partition-count cliff the sf0.1 battery cannot see.
  *
  * Corpus construction (deterministic, no RNG):
  *   - documents: M id-shifted copies; every token in copy k is
  *     prefixed `c<k>_`, so copies are textually DISJOINT — each copy
  *     reproduces the original near-dup structure without cross-copy
  *     gram/shingle collisions. That keeps the workload's duplication
  *     DENSITY constant while volume scales M×, which is the scaling
  *     experiment (a replicated-verbatim corpus would instead measure
  *     the degenerate all-duplicates regime: dup-cluster size M,
  *     candidate pairs ~M² per doc — a different, pathological test).
  *   - embeddings: M vec_id-shifted copies (vectors unchanged).
  *   - lineitem: M verbatim copies (percentiles only see more rows).
  *   - all other tables: symlinked from the base dir.
  *
  * Output: one `PROFILE ...` line per (corpus, query) measurement and a
  * closing JSON summary line; PROFILE.md holds the analyzed curves.
  */
object Profile {

  /** Total shuffle bytes across completed stages; Spark's listener bus
    * is async, so [[settle]] polls until the counters stop moving.
    * Shared with the focused profile mains (e.g.
    * [[graft.tools.SpanProbeBench]]). */
  private[graft] final class StageMetrics extends SparkListener {
    val read = new java.util.concurrent.atomic.AtomicLong
    val write = new java.util.concurrent.atomic.AtomicLong
    // spill = the "did a sort/agg overflow its task memory" signal the
    // shuffle counters can't show (VERDICT r6 #6: the battery sort's
    // 64x spill claim needs a counter, not an inference)
    val spill = new java.util.concurrent.atomic.AtomicLong
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        read.addAndGet(m.shuffleReadMetrics.localBytesRead +
          m.shuffleReadMetrics.remoteBytesRead)
        write.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        spill.addAndGet(m.diskBytesSpilled)
      }
    }
    def settle(): (Long, Long, Long) = {
      var last = (read.get, write.get, spill.get)
      var stable = 0
      var waited = 0
      while (stable < 2 && waited < 5000) {
        Thread.sleep(100); waited += 100
        val now = (read.get, write.get, spill.get)
        if (now == last) stable += 1 else { stable = 0; last = now }
      }
      last
    }
  }

  /** Per-job wall seconds with the job description, in completion
    * order — THE job-accounting listener for the measurement tools
    * (QueryJobs / ProbeLegs / SpanVariance each hand-rolled a variant;
    * the boxed-value-vs-null-unboxing bug class this shape dodges now
    * lives in exactly one place). Snapshot AFTER removing the listener
    * plus a short bus drain (the bus is async). */
  private[graft] final class JobTimes extends SparkListener {
    private val starts =
      new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]
    private val acc =
      scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    override def onJobStart(js: SparkListenerJobStart): Unit =
      starts.put(js.jobId, (System.nanoTime(),
        Option(js.properties)
          .map(_.getProperty("spark.job.description", "")).getOrElse("")))
    override def onJobEnd(je: SparkListenerJobEnd): Unit = {
      val st = starts.remove(je.jobId)
      if (st != null) acc.synchronized {
        acc += ((st._2, (System.nanoTime() - st._1) / 1e9))
      }
    }
    def snapshot(): Seq[(String, Double)] = acc.synchronized(acc.toList)
    def clear(): Unit = acc.synchronized(acc.clear())
  }

  private val ProfileQueries = Seq(
    "q_dedup_clusters", "q_simhash_pairs", "q_ngram_jaccard",
    "q_percentiles", "q_curation_pipeline",
    // round-5 additions with corpus-wide aggregation + broadcast legs:
    // line counting/blocklist and vocab learning/scoring must both stay
    // ~linear per unit of corpus
    "q_line_dedup", "q_lm_coverage",
    // round-5 addition: the char-LM model/scoring passes must stay two
    // linear scans with a broadcast model. (q_edit_distance is NOT
    // profiled: its cost is O(candidate pairs × L²) by definition —
    // the scale control is the candidate count, which the jaccard
    // profile above already tracks.)
    "q_charlm_score",
    // round-8 additions (VERDICT r6 #4): the two most expensive battery
    // queries and the IVF-PQ rerank leg get regression baselines —
    // winnowing is explode + window + banded self-join, BPE encode is a
    // broadcast-merges scan, and the rerank leg must stay bounded by
    // |queries|·r float rows regardless of corpus size
    "q_winnow_pairs", "q_bpe_tokens", "q_ann_pq_rerank_topk",
    // round-8 operators: cluster-blocked pair join (must track cluster
    // population, not corpus²), bounded sketch state, and the two-agg
    // broadcast model
    "q_semdedup", "q_cms_registers", "q_dsir_weights",
    // round-9 operators: broadcast-round PageRank (edge graph frozen,
    // rank table broadcast), map-side rule bundle + repetition agg,
    // and the hash-only-exchange image pipeline
    "q_pagerank", "q_quality_gate", "q_image_neardup")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("SPARK_GRAFT_PROFILE_MULT", "64").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = if (args.nonEmpty) args.toSeq else ProfileQueries
    // at 100 TB you size shuffle partitions to the data (~128 MB/task),
    // not the core count; the override lets a profile run test that
    // sizing (e.g. spill attribution: fixed 32 partitions over a 64×
    // corpus pushes ~160 MB+ into each hash-agg task)
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.functions.register(spark)
    spark.range(1000000).selectExpr("sum(id)").collect() // JVM warmup

    val synDir = buildSynthetic(spark, sfDir, mult)
    // quiesce after the synthetic build: the multi-GB crossJoin write
    // leaves async work (ContextCleaner shuffle/broadcast deletion, GC
    // of the build's task results) that otherwise lands inside the
    // FIRST measured query — observed as a stable ~7× inflation of
    // whichever query runs first at mult=64, vanishing at mult=2
    spark.range(1000000).selectExpr("sum(id)").collect()
    System.gc()
    Thread.sleep(3000)
    val metrics = new StageMetrics
    spark.sparkContext.addSparkListener(metrics)

    def run(name: String, dir: String): (Double, Long, Long, Long) = {
      val (r0, w0, s0) = metrics.settle()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.mode("overwrite").format("noop").save()
      val sec = (System.nanoTime() - t0) / 1e9
      val (r1, w1, s1) = metrics.settle()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.catalog.clearCache()
      (sec, r1 - r0, w1 - w0, s1 - s0)
    }

    val rows = for (name <- names) yield {
      // throwaway warm pass on EACH corpus: plan compilation + codegen
      // land in the base warm pass, and any one-time per-dir index
      // build (pqIndexCache, clusterTableCache, NearDupIndex) lands in
      // the scaled warm pass — so BOTH measured runs see steady state
      // and the ratio is a pure data-scaling curve. One-time build cost
      // is attributed separately (the bench `load` map), not smeared
      // into the scaling baseline.
      run(name, sfDir)
      val (bSec, bR, bW, bS) = run(name, sfDir)
      println(f"PROFILE base mult=1 q=$name sec=$bSec%.2f " +
        f"shuffle_read_mb=${bR / 1e6}%.1f shuffle_write_mb=${bW / 1e6}%.1f " +
        f"spill_mb=${bS / 1e6}%.1f")
      run(name, synDir)
      val (sSec, sR, sW, sS) = run(name, synDir)
      println(f"PROFILE scaled mult=$mult q=$name sec=$sSec%.2f " +
        f"shuffle_read_mb=${sR / 1e6}%.1f shuffle_write_mb=${sW / 1e6}%.1f " +
        f"spill_mb=${sS / 1e6}%.1f " +
        f"time_x=${sSec / bSec}%.1f shuffle_x=${
          if (bW > 0) sW.toDouble / bW else Double.NaN}%.1f")
      (name, bSec, bR, bW, bS, sSec, sR, sW, sS)
    }

    val qjson = rows.map { case (n, bs, br, bw, bsp, ss, sr, sw, ssp) =>
      s""""$n":{"base_sec":${f"$bs%.3f"},"base_shuffle_rw":[$br,$bw],""" +
        s""""base_spill":$bsp,"scaled_sec":${f"$ss%.3f"},""" +
        s""""scaled_shuffle_rw":[$sr,$sw],"scaled_spill":$ssp}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"profile","mult":$mult,"sf":"$sfDir","queries":$qjson}""")
    spark.stop()
  }

  /** Materialize the multiplied corpus into a temp dir (see object doc
    * for the construction); small tables are symlinked. Reuses an
    * existing dir for the same (sf, mult) within one machine boot.
    * Shared with the focused profile mains
    * ([[graft.tools.IngestLatency]]). */
  private[graft] def buildSynthetic(spark: SparkSession, sfDir: String,
      mult: Int): String = {
    val tag = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    // v2: events are now SCALED (not symlinked) so the archive-query
    // family can ladder; the version bump invalidates stale v1 caches
    val synVersion = 2
    val syn = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft-profile-$tag-x$mult-v$synVersion")
    val done = new java.io.File(syn, "_READY")
    if (done.exists()) return syn.toString
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory && java.nio.file.Files.isSymbolicLink(f.toPath) == false)
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete()
    }
    if (syn.exists()) rm(syn)
    // sweep superseded-version caches for the same (sf, mult): the v1→v2
    // rename otherwise strands the old multi-GB corpus in tmpdir forever
    // (the delete-and-rebuild branch above only ever sees the NEW name).
    // Only versions STRICTLY BELOW this build's are swept (ADVICE r14
    // #4): a -v3 left by a newer build must survive a downgrade's run,
    // and an unparsable suffix is left alone rather than guessed at.
    // A candidate with no _READY but a recent mtime is a build in
    // progress by a concurrent JVM — yanking a multi-GB corpus out from
    // under it would fail that run, so it is skipped too (an abandoned
    // half-build ages past the grace window and gets swept next time).
    val Versioned = (java.util.regex.Pattern.quote(
      s"graft-profile-$tag-x$mult") + "-v(\\d+)").r
    val graceMs = 6L * 3600 * 1000
    Option(new java.io.File(sys.props("java.io.tmpdir")).listFiles())
      .getOrElse(Array.empty)
      .filter { f =>
        val below = f.getName match {
          case n if n == s"graft-profile-$tag-x$mult" => true // pre-v era
          case Versioned(v) => v.toIntOption.exists(_ < synVersion)
          case _ => false
        }
        val inProgress = !new java.io.File(f, "_READY").exists() &&
          System.currentTimeMillis() - f.lastModified() < graceMs
        below && !inProgress
      }
      .foreach(rm)
    syn.mkdirs()
    val copies = spark.range(mult).select(col("id").cast("int").as("__k"))

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.crossJoin(broadcast(copies))
      .select(
        (col("doc_id") + col("__k").cast("long") * 1000000L).as("doc_id"),
        concat_ws(" ", transform(split(col("text"), " "),
          t => concat(lit("c"), col("__k"), lit("_"), t))).as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")))
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(s"$syn/documents.parquet")

    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .crossJoin(broadcast(copies))
      .select((col("vec_id") + col("__k").cast("long") * 1000000L).as("vec_id"),
        col("embedding"), col("label"))
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(s"$syn/embeddings.parquet")

    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .crossJoin(broadcast(copies)).drop("__k")
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(s"$syn/lineitem.parquet")

    // events scale like documents: copies keep their timestamps (the
    // archive queries' time-window selectivity stays a constant
    // fraction) under fresh event_ids, so interval/cursor scans see
    // mult x the rows they'd see at sfDir
    spark.read.parquet(s"$sfDir/events.parquet")
      .crossJoin(broadcast(copies))
      .select(
        (col("event_id") + col("__k").cast("long") * 1000000000L)
          .as("event_id"),
        col("ts"), col("user_id"), col("event_type"), col("value"),
        col("props"))
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(s"$syn/events.parquet")

    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders")) {
      val link = java.nio.file.Paths.get(syn.toString, s"$t.parquet")
      if (!java.nio.file.Files.exists(link))
        // absolute target: a relative sf dir would resolve against the
        // LINK's directory and dangle
        java.nio.file.Files.createSymbolicLink(link,
          java.nio.file.Paths.get(sfDir, s"$t.parquet").toAbsolutePath)
    }
    done.createNewFile()
    syn.toString
  }
}
