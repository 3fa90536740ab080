package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming-ingest latency curves (VERDICT r8 #7): the four
  * history-backed dedup units claim per-batch cost INDEPENDENT of
  * history size — this main measures it end to end instead of arguing
  * from plan asserts. For each history multiplier (default 1×/8×/64×,
  * via [[graft.Profile.buildSynthetic]]'s disjoint-copy corpus) it
  * seeds a fresh index family with the multiplied corpus, then runs the
  * SAME fixed 1×-sized batch sequence through each stream's
  * foreachBatch unit and prints one INGESTLAT line per (op, mult,
  * batch): wall seconds + shuffle read/write bytes.
  *
  *   - `exact`    = [[graft.store.FingerprintIndex.ingestResolved]]
  *                  (the [[graft.streaming.StreamOps.curateWithHistory]]
  *                  unit)
  *   - `spans`    = [[graft.store.GramIndex.ingest]] (the
  *                  `scrubSpansWithHistory` unit — Bloom-prefiltered
  *                  history probe)
  *   - `neardup`  = [[graft.store.NearDupIndex.ingest]] (the
  *                  `curateAllWithHistory` whole-doc near-dup stage,
  *                  same two-layer pruning)
  *   - `semantic` = [[graft.operators.CellIndex.semanticIngestResolved]]
  *                  (the `semanticIngestStream` unit)
  *   - `pipeline` = [[graft.streaming.StreamOps.curateAllBatch]] (the
  *                  COMPOSED five-stage `curateAllWithHistory` unit —
  *                  gate → exact → near-dup → span-scrub → semantic —
  *                  over mixed dup+novel batches, with the
  *                  `maintainAll` sweep timed after every batch)
  *
  * Batch construction: each history dir's OWN copy-0 documents
  * (doc_id < 1e6 — at mult=1 that is the raw base corpus) with ids
  * shifted to a novel range — texts/vectors IDENTICAL to the history's
  * copy-0 rows, so every op does real duplicate-detection work against
  * copy-0 history, and that hit set is CONSTANT across multipliers
  * (the other synthetic copies are textually disjoint; drawing the
  * batch from the per-dir corpus matters because the synthetic build
  * token-prefixes copy 0 too — a raw-base batch would be all-duplicate
  * at 1× and all-novel at 8×/64×, comparing different work). A flat
  * curve therefore means the probe legs really are pruned to the
  * batch's own keys / cells; growth with mult would mean the batch is
  * paying for history it can never match. Three batches per (op,
  * mult): batch 1 carries plan compilation + any first-touch cost,
  * batches 2-3 are the steady-state micro-batch latency.
  *
  * Usage: runMain graft.tools.IngestLatency [sfDir] [mults...]
  * With SPARK_GRAFT_WARM=1, each store's `warm()` (driver-side
  * listing + footer pre-touch) runs between seeding and batch 1 and is
  * timed separately — the measurement behind the first-touch-outlier
  * mitigation (PROFILE round-9c).
  */
object IngestLatency {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mults =
      if (args.length > 1) args.drop(1).toSeq.map(_.toInt) else Seq(1, 8, 64)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // SPARK_GRAFT_WARM=1: call each store's warm() between seed and
    // batch 1 — the first-touch-outlier mitigation under measurement
    val warm = sys.env.get("SPARK_GRAFT_WARM").contains("1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.functions.register(spark)

    val metrics = new graft.Profile.StageMetrics
    spark.sparkContext.addSparkListener(metrics)

    // fixed 1x-sized batch sequence: three disjoint copy-0 doc slices
    // of the given dir, ids shifted novel, text/vectors verbatim
    def docBatches(dir: String): Seq[DataFrame] = (0 until 3).map { i =>
      spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
        .filter(col("doc_id") < 1000000L && col("doc_id") % 3 === i)
        .select((col("doc_id") + 900000000L).as("doc_id"), col("text"))
        .localCheckpoint(true) // pin: measure the ingest, not the scan
    }
    def embBatches(dir: String): Seq[DataFrame] = (0 until 3).map { i =>
      spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
        .filter(col("vec_id") < 1000000L && col("vec_id") % 3 === i)
        .select((col("vec_id") + 900000000L).as("vec_id"), col("embedding"))
        .localCheckpoint(true)
    }

    // composed-pipeline batches: the dup half is the docBatches slice
    // joined to its vectors (copy-0 texts, novel ids — real duplicate
    // work, dropped at the exact leg); the novel half prefixes every
    // token (novel fingerprints/bands/grams) and REVERSES the vector
    // under a disjoint id range, so it pays every leg and appends.
    // Reversal (a dimension permutation) preserves every pairwise
    // cosine among the novel half — within-batch near-dup work equals
    // the original corpus's — while scattering the vectors away from
    // their stored originals; negation would instead pile every novel
    // vector into the few anti-aligned cells and make the semantic
    // leg's hot-cell population grow with every appended batch. All
    // five stages do real work and the mix is CONSTANT across
    // multipliers.
    def pipeBatches(dir: String): Seq[DataFrame] = (0 until 3).map { i =>
      val d = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
        .filter(col("doc_id") < 1000000L && col("doc_id") % 3 === i)
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id").as("doc_id"), col("embedding"))
        .filter(col("doc_id") < 1000000L && col("doc_id") % 3 === i)
      val joined = d.join(e, Seq("doc_id"))
      val dup = joined.select((col("doc_id") + 900000000L).as("doc_id"),
        col("text"), col("embedding"))
      val novel = joined.select((col("doc_id") + 950000000L).as("doc_id"),
        concat_ws(" ", transform(split(col("text"), " "),
          t => concat(lit("zz"), t))).as("text"),
        reverse(col("embedding")).as("embedding"))
      dup.unionByName(novel).localCheckpoint(true)
    }

    def tmp(p: String) =
      java.nio.file.Files.createTempDirectory(p).toString

    def measure(op: String, mult: Int, batch: Int)(f: => Long): Unit = {
      val (r0, w0, _) = metrics.settle()
      val t0 = System.nanoTime()
      val rows = f
      val sec = (System.nanoTime() - t0) / 1e9
      val (r1, w1, _) = metrics.settle()
      println(f"INGESTLAT op=$op mult=$mult batch=$batch sec=$sec%.2f " +
        f"shuffle_read_mb=${(r1 - r0) / 1e6}%.1f " +
        f"shuffle_write_mb=${(w1 - w0) / 1e6}%.1f rows=$rows")
    }

    for (mult <- mults) {
      val dir =
        if (mult == 1) sfDir
        else graft.Profile.buildSynthetic(spark, sfDir, mult)
      val histDocs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val histEmb = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      val dBatches = docBatches(dir)
      val eBatches = embBatches(dir)

      val fp = new graft.store.FingerprintIndex(spark, tmp("lat-fp"))
      val t0 = System.nanoTime()
      fp.ingest(histDocs)
      println(f"INGESTLAT seeded op=exact mult=$mult " +
        f"sec=${(System.nanoTime() - t0) / 1e9}%.1f")
      if (warm) {
        val w0 = System.nanoTime()
        val n = fp.warm()
        println(f"INGESTLAT warmed op=exact mult=$mult n=$n " +
          f"sec=${(System.nanoTime() - w0) / 1e9}%.1f")
      }
      dBatches.zipWithIndex.foreach { case (b, i) =>
        measure("exact", mult, i + 1)(fp.ingestResolved(b).count())
      }

      val gr = new graft.store.GramIndex(spark, tmp("lat-gr"),
        w = 8, buckets = 64)
      val t1 = System.nanoTime()
      gr.ingest(histDocs)
      println(f"INGESTLAT seeded op=spans mult=$mult " +
        f"sec=${(System.nanoTime() - t1) / 1e9}%.1f")
      if (warm) {
        val w0 = System.nanoTime()
        val n = gr.warm()
        println(f"INGESTLAT warmed op=spans mult=$mult n=$n " +
          f"sec=${(System.nanoTime() - w0) / 1e9}%.1f")
      }
      dBatches.zipWithIndex.foreach { case (b, i) =>
        measure("spans", mult, i + 1)(gr.ingest(b).count())
      }

      val nd = new graft.store.NearDupIndex(spark, tmp("lat-nd"),
        buckets = 64)
      val t3 = System.nanoTime()
      nd.append(histDocs)
      println(f"INGESTLAT seeded op=neardup mult=$mult " +
        f"sec=${(System.nanoTime() - t3) / 1e9}%.1f")
      if (warm) {
        val w0 = System.nanoTime()
        val n = nd.warm()
        println(f"INGESTLAT warmed op=neardup mult=$mult n=$n " +
          f"sec=${(System.nanoTime() - w0) / 1e9}%.1f")
      }
      dBatches.zipWithIndex.foreach { case (b, i) =>
        measure("neardup", mult, i + 1)(nd.ingest(b).count())
      }

      val cell = new graft.operators.CellIndex(spark, tmp("lat-cell"))
      val t2 = System.nanoTime()
      cell.buildLearned(histEmb, k = 64, iters = 2)
      println(f"INGESTLAT seeded op=semantic mult=$mult " +
        f"sec=${(System.nanoTime() - t2) / 1e9}%.1f")
      if (warm) {
        val w0 = System.nanoTime()
        val n = cell.warm()
        println(f"INGESTLAT warmed op=semantic mult=$mult n=$n " +
          f"sec=${(System.nanoTime() - w0) / 1e9}%.1f")
      }
      eBatches.zipWithIndex.foreach { case (b, i) =>
        measure("semantic", mult, i + 1)(
          cell.semanticIngestResolved(b, thresholdMicro = 300000L)._1.count())
      }

      // the COMPOSED five-stage pipeline (gate → exact → neardup →
      // spans → semantic, the curateAllWithHistory foreachBatch unit)
      // against the same histories: fresh stores seeded identically,
      // then each mixed batch runs end to end, with the maintainAll
      // sweep timed separately after every batch (the
      // maintenanceEvery=1 schedule)
      val fpP = new graft.store.FingerprintIndex(spark, tmp("lat-pfp"))
      val grP = new graft.store.GramIndex(spark, tmp("lat-pgr"),
        w = 8, buckets = 64)
      val ndP = new graft.store.NearDupIndex(spark, tmp("lat-pnd"),
        buckets = 64)
      val cellP = new graft.operators.CellIndex(spark, tmp("lat-pcell"))
      val t5 = System.nanoTime()
      fpP.ingest(histDocs)
      grP.ingest(histDocs)
      ndP.append(histDocs)
      cellP.buildLearned(histEmb, k = 64, iters = 2)
      println(f"INGESTLAT seeded op=pipeline mult=$mult " +
        f"sec=${(System.nanoTime() - t5) / 1e9}%.1f")
      if (warm) {
        val w0 = System.nanoTime()
        val n = fpP.warm() + grP.warm() + ndP.warm() + cellP.warm()
        println(f"INGESTLAT warmed op=pipeline mult=$mult n=$n " +
          f"sec=${(System.nanoTime() - w0) / 1e9}%.1f")
      }
      // permissive gate: the tool measures pipeline cost, not gate
      // selectivity — junk-heavy corpora shortcut the very legs under
      // measurement
      val gateCfg = Some(graft.streaming.GateConfig(
        minWords = 2L, maxWords = 100000L, minStopwords = 0))
      pipeBatches(dir).zipWithIndex.foreach { case (b, i) =>
        measure("pipeline", mult, i + 1) {
          var n = 0L
          graft.streaming.StreamOps.curateAllBatch(b, fpP, ndP, grP,
            cellP, boilerplate = Seq.empty, minKeptTokens = 1,
            thresholdMicro = 300000L, nprobe = 1, gate = gateCfg,
            gateSink = (_, _) => (), onStage = _ => (),
            batchId = i + 1L)((df, _) => n = df.count())
          n
        }
        val m0 = System.nanoTime()
        graft.streaming.StreamOps.maintainAll(fpP, ndP, grP, cellP)
        println(f"INGESTLAT maintain op=pipeline mult=$mult " +
          f"batch=${i + 1} sec=${(System.nanoTime() - m0) / 1e9}%.1f")
      }
    }
    spark.stop()
  }
}
