package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: attribute the spans-leg batch variance (VERDICT r10 #5 —
  * PROFILE round-10c measured GramIndex ingest batches of 34/34/6 s at
  * 64× history with IDENTICAL shuffle bytes). Seeds a 64× gram index
  * exactly as IngestLatency does, then runs the same three batch
  * slices TWICE — first straight after seeding (the round-10c
  * condition), then after an explicit quiesce (System.gc + settle, the
  * Profile.buildSynthetic mitigation) with fresh id ranges — recording
  * per batch: wall, GC-time delta, job count + top jobs, and shuffle
  * bytes. If the early batches carry the seeding job's async tail
  * (old-gen collection of the seed's task results, ContextCleaner
  * shuffle deletion), the GC column and the quiesced arm name it.
  *
  * Usage: runMain graft.tools.SpanVariance [sfDir] [mult]
  */
object SpanVariance {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = args.lift(1).map(_.toInt).getOrElse(64)
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

    val metrics = new graft.Profile.StageMetrics
    spark.sparkContext.addSparkListener(metrics)
    import scala.jdk.CollectionConverters._
    def gcMs: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum

    // the shared job-accounting listener (graft.Profile.JobTimes) — the
    // null-unboxing hazard its tuple values dodge is documented there
    val jobTimes = new graft.Profile.JobTimes
    spark.sparkContext.addSparkListener(jobTimes)

    val dir =
      if (mult == 1) sfDir else graft.Profile.buildSynthetic(spark, sfDir, mult)
    val histDocs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    def batch(i: Int, shift: Long) =
      spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
        .filter(col("doc_id") < 1000000L && col("doc_id") % 3 === i)
        .select((col("doc_id") + shift).as("doc_id"), col("text"))
        .localCheckpoint(true)

    def tmp(p: String) =
      java.nio.file.Files.createTempDirectory(p).toString
    val gr = new graft.store.GramIndex(spark, tmp("sv-gr"),
      w = 8, buckets = 64)
    val t0 = System.nanoTime()
    gr.ingest(histDocs)
    println(f"SPANVAR seeded mult=$mult " +
      f"sec=${(System.nanoTime() - t0) / 1e9}%.1f")
    val wn = gr.warm()
    println(s"SPANVAR warmed n=$wn")

    def run(tag: String, i: Int, shift: Long): Unit = {
      val (r0, w0, s0) = metrics.settle()
      val g0 = gcMs
      jobTimes.clear()
      val t = System.nanoTime()
      val rows = gr.ingest(batch(i, shift)).count()
      val sec = (System.nanoTime() - t) / 1e9
      val (r1, w1, s1) = metrics.settle()
      val snap = jobTimes.snapshot().map(_._2)
      val top = snap.sorted.reverse.take(3).map(d => f"$d%.1f").mkString("/")
      val nJobs = snap.size
      println(f"SPANVAR arm=$tag batch=${i + 1} sec=$sec%.2f " +
        f"gc_ms=${gcMs - g0} jobs=$nJobs top=$top " +
        f"shuffle_mb=${(r1 - r0 + w1 - w0) / 1e6}%.1f " +
        f"spill_mb=${(s1 - s0) / 1e6}%.1f rows=$rows")
    }

    // arm 1: straight after seeding — the round-10c condition
    (0 until 3).foreach(i => run("post-seed", i, 900000000L))
    // quiesce: let the seed/batch tail drain, force a full collection
    spark.range(1000000).selectExpr("sum(id)").collect()
    System.gc()
    Thread.sleep(3000)
    // arm 2: same slices, fresh id range (novel, not replays)
    (0 until 3).foreach(i => run("quiesced", i, 910000000L))
    spark.stop()
  }
}
