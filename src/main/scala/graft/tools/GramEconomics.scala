package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.store.GramIndex

/** Measures the [[graft.store.GramIndex]] economics the PROFILE keeps
  * honest: the index is O(corpus tokens) by construction, so the number
  * that matters is the CONSTANT — stored bytes per corpus token — and
  * that it stays flat as the corpus scales. Ingests `documents.parquet`
  * from each arg dir into a fresh temp index and prints one GRAMECON
  * line per dir: corpus tokens, distinct gram rows, stored bytes,
  * bytes/token, and ingest wall seconds.
  *
  * Usage: runMain graft.tools.GramEconomics <sfDir> [<sfDir> ...]
  * (point the second arg at a graft.Profile synthetic dir for the 64×
  * row).
  */
object GramEconomics {
  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1")
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

    for (dir <- dirs) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val tokens = docs
        .select(size(split(col("text"), "\\s+")).as("n"))
        .agg(sum(col("n"))).first().getLong(0)
      val path = java.nio.file.Files
        .createTempDirectory("graft-gramecon-").toString
      val idx = new GramIndex(spark, path, w = 8, buckets = 256)
      val t0 = System.nanoTime()
      idx.ingest(docs)
      val sec = (System.nanoTime() - t0) / 1e9
      val s = idx.stats()
      val rows = idx.grams.count()
      println(f"GRAMECON dir=$dir tokens=$tokens gram_rows=$rows " +
        f"live_dirs=${s.liveDirs} cells=${s.cells} files=${s.files} " +
        f"bytes=${s.bytes} bytes_per_token=${s.bytes.toDouble / tokens}%.1f " +
        f"ingest_sec=$sec%.1f")
    }
    spark.stop()
  }
}
