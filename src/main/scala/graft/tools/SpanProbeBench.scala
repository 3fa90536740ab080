package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.store.GramIndex

/** Focused experiment for the dup-span history-probe cliff (PROFILE.md
  * round-8b: `q_dup_spans_history` shuffles 3.2×/unit at 64× because
  * both the pruned-history leg and the probe leg exchange once the
  * duplicated-gram set outgrows the broadcast threshold). The
  * hypothesis under test: a Bloom prefilter over the BATCH's gram keys
  * ([[GramIndex]] `bloomMaxKeys`) shrinks the history leg to the true
  * matches + ~1% false positives BEFORE any exchange, so a bounded
  * micro-batch's probe cost tracks the batch — not the history — even
  * after bucket pruning saturates (a batch of more than a few thousand
  * distinct grams touches every one of 64 buckets).
  *
  * Setup mirrors the battery's `q_dup_spans_history` at the streaming
  * operating point: history = the even-doc_id half of the (usually
  * 64×-multiplied) corpus in `histDir`, ingested once into a persistent
  * index under /tmp (reused across runs, `_READY`-marked); batch = the
  * odd half of copy 0 only (doc_id < 1e6) — a 1×-sized arriving
  * micro-batch whose grams DO hit copy-0 history (the multiplied
  * copies' tokens are `c<k>_`-prefixed, so they are textually disjoint
  * from the batch and are exactly the "unrelated history" the probe
  * must not pay for). Probes run twice per mode (warm measurement) with
  * the prefilter on (default `bloomMaxKeys`) and off (`bloomMaxKeys=0`)
  * and print one SPANPROBE line per measured run: wall seconds +
  * shuffle read/write bytes + result-row count (which must be identical
  * across modes — the no-false-negative check riding along).
  *
  * Usage: runMain graft.tools.SpanProbeBench [histDir]
  *   (default histDir = the graft.Profile 64× synthetic dir for sf0.1)
  */
object SpanProbeBench {
  def main(args: Array[String]): Unit = {
    val histDir = args.headOption.getOrElse(
      "/tmp/graft-profile-_root_testdata_sf0.1-x64")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.functions.register(spark)

    val docs = spark.read.parquet(s"$histDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val idxPath = ensureHistory(spark, docs, histDir)
    val batch = docs
      .filter(col("doc_id") % 2 === 1 && col("doc_id") < 1000000L)
      .localCheckpoint(true) // pin the batch: measure the probe, not the scan

    val metrics = new graft.Profile.StageMetrics
    spark.sparkContext.addSparkListener(metrics)

    def measure(mode: String, idx: GramIndex): Long = {
      var rows = -1L
      for (pass <- 1 to 2) {
        val (r0, w0, _) = metrics.settle()
        val t0 = System.nanoTime()
        rows = idx.probe(batch).count()
        val sec = (System.nanoTime() - t0) / 1e9
        val (r1, w1, _) = metrics.settle()
        println(f"SPANPROBE mode=$mode pass=$pass sec=$sec%.2f " +
          f"shuffle_read_mb=${(r1 - r0) / 1e6}%.1f " +
          f"shuffle_write_mb=${(w1 - w0) / 1e6}%.1f rows=$rows")
      }
      rows
    }

    val on = measure("bloom_on", new GramIndex(spark, idxPath, w = 8,
      buckets = 64))
    val off = measure("bloom_off", new GramIndex(spark, idxPath, w = 8,
      buckets = 64, bloomMaxKeys = 0L))
    require(on == off, s"result rows diverged: bloom_on=$on bloom_off=$off")
    println(s"SPANPROBE parity rows=$on (identical across modes)")
    spark.stop()
  }

  /** Ingest the even half of `docs` into a persistent [[GramIndex]]
    * keyed by the corpus dir; `_READY`-marked so repeated experiment
    * runs skip the (minutes-long at 64×) one-time build. */
  private def ensureHistory(spark: SparkSession, docs: DataFrame,
      histDir: String): String = {
    val tag = histDir.replaceAll("[^A-Za-z0-9.]", "_")
    val root = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft-gramhist-$tag")
    val ready = new java.io.File(root, "_READY")
    if (ready.exists()) return root.toString
    if (root.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory)
          Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete()
      }
      rm(root)
    }
    val t0 = System.nanoTime()
    val idx = new GramIndex(spark, root.toString, w = 8, buckets = 64)
    idx.ingest(docs.filter(col("doc_id") % 2 === 0))
    val s = idx.stats()
    println(f"SPANPROBE history built sec=${(System.nanoTime() - t0) / 1e9}%.1f " +
      f"gram_rows=${idx.grams.count()} bytes=${s.bytes}")
    ready.createNewFile()
    root.toString
  }
}
