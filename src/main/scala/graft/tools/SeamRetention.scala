package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Reliable-checkpoint RETENTION soak (VERDICT r14 #8): the last open
  * question on the library-wide durability seam was whether a
  * long-running reliable-mode process (a streaming ingester doing one
  * barrier-heavy build per batch) accumulates checkpoint files without
  * bound. The seam's scaladoc points at
  * `spark.cleaner.referenceTracking.cleanCheckpoints`; this main
  * MEASURES that the combination actually bounds the directory:
  *
  *   - session configured with the reliable dir + the cleaner flag
  *     (the flag must be set at context creation — it is read when each
  *     checkpoint registers for cleanup, so the shared-session test JVM
  *     cannot exercise it; hence a forked main, not a spec);
  *   - N batches, each running the most barrier-hungry library build
  *     (jaccardSelfJoin: words pin + prefix pin + result pin per call)
  *     over a fresh sample, releasing the result like a real caller;
  *   - after each batch: drop the frame reference, System.gc(), give
  *     the ContextCleaner's async delete a moment, then count rdd-*
  *     checkpoint dirs under the checkpoint root.
  *
  * PASS = the count at batch N is bounded by a small constant (the
  * in-flight batch's own pins), not ~3N. The measured numbers live in
  * SCALE.md ("Durability" note). */
object SeamRetention {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val batches = sys.env.getOrElse("SPARK_GRAFT_SEAM_BATCHES", "8").toInt
    val ckDir = java.nio.file.Files
      .createTempDirectory("graft-seam-retention-").toString
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.graft.checkpoint.dir", ckDir)
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.functions.register(spark)

    def rddDirs(): Int = {
      def walk(f: java.io.File): Int =
        if (f.getName.startsWith("rdd-")) 1
        else Option(f.listFiles()).getOrElse(Array.empty).map(walk).sum
      walk(new java.io.File(ckDir))
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val counts = (1 to batches).map { b =>
      // a fresh deterministic sample per batch — each build runs the
      // full words/prefix/result barrier chain in reliable mode
      val base = graft.queries.TextQueries.jaccardBase(
        docs.filter(col("doc_id") % batches === (b - 1) % batches))
      val pairs = graft.operators.Dedup.jaccardSelfJoin(
        base, "doc_id", "words", Seq("lang", "size_bucket"), 1, 4)
      val n = pairs.count()
      // release like a real caller: the result pin is done with
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.catalog.clearCache()
      // let the ContextCleaner see the dead references and delete
      System.gc()
      Thread.sleep(2000)
      val files = rddDirs()
      println(s"SEAM-RETENTION batch=$b pairs=$n rdd_dirs=$files")
      files
    }
    val bounded = counts.last <= counts.take(3).max + 3
    println(s"""{"metric":"seam_retention","batches":$batches,""" +
      s""""rdd_dirs":${counts.mkString("[", ",", "]")},""" +
      s""""bounded":$bounded,"dir":"$ckDir"}""")
    spark.stop()
    // the soak's own checkpoint root is disposable
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete()
    }
    rm(new java.io.File(ckDir))
  }
}
