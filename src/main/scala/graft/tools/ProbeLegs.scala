package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: per-leg timing for the `q_neardup_probe` battery spot —
  * the top battery cost three rounds running. Separates the minhash
  * signature leg from the band-join + Levenshtein confirm, and the raw
  * probe from the battery's determinism sort, so a fix (if any)
  * targets the real spender.
  *
  * Usage: runMain graft.tools.ProbeLegs /root/testdata/sf0.1
  */
object ProbeLegs {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("graft-probelegs")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.functions.register(spark)

    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probelegs] $label%-42s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }

    val docs = graft.queries.Tables.read(spark, dir, "documents")
    val path = java.nio.file.Files
      .createTempDirectory("graft-probelegs-").toString
    val idx = new graft.store.NearDupIndex(spark, path)
    timed("append history (corpus)") { idx.append(docs); 0L }

    val batch = docs.filter(col("doc_id") % 10 === 0)
      .withColumn("doc_id", col("doc_id") + 1000000000L)
      .localCheckpoint(true)
    println(s"[probelegs] batch docs = ${batch.count()}")

    // leg 1 proxy: the minhash band signature of the batch alone
    timed("minhash bands of batch (leg 1)") {
      graft.operators.Dedup.minhashBands(batch, 8, 4).count()
    }
    // warm + steady-state: two raw probes (no sort)
    timed("probe raw #1") { idx.probe(batch).count() }
    // job-level accounting for the steady-state probe: every Spark
    // action the probe fires, with its wall time — finds whether the
    // 2 s is one real stage or many small fixed-overhead jobs
    val listener = new graft.Profile.JobTimes
    spark.sparkContext.addSparkListener(listener)
    timed("probe raw #2") { idx.probe(batch).count() }
    spark.sparkContext.removeSparkListener(listener)
    Thread.sleep(500)
    listener.snapshot().zipWithIndex.foreach { case ((d, t), i) =>
      println(f"[probelegs]   job#$i%-3d $t%7.3f s  $d")
    }
    // the battery spelling: global orderBy (range sampling re-executes
    // the child unless the checkpoint fence holds)
    timed("probe + orderBy (battery spelling)") {
      idx.probe(batch).orderBy(col("doc_id"), col("hist_id")).count()
    }
    timed("probe + repartition(1).sortWithin") {
      idx.probe(batch).repartition(1)
        .sortWithinPartitions(col("doc_id"), col("hist_id")).count()
    }
    // write through noop like Bench does
    timed("probe + orderBy -> noop (bench shape)") {
      idx.probe(batch).orderBy(col("doc_id"), col("hist_id"))
        .write.mode("overwrite").format("noop").save(); 0L
    }
    spark.stop()
  }
}
