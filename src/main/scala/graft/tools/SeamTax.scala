package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: the durability tax, measured — the same barrier-heavy
  * operators timed under the default executor-local barriers and under
  * the reliable-checkpoint flag (`spark.graft.checkpoint.dir`), so the
  * cluster-durability trade SCALE.md round-14 documents carries a
  * number instead of an adjective. Reliable mode pays one filesystem
  * round-trip per barrier (write at pin, re-read at each consumer);
  * on local[32] that filesystem is the page cache, so the measured tax
  * is a LOWER bound for a real object store and a fair ceiling for
  * HDFS-on-NVMe.
  *
  * Usage: runMain graft.tools.SeamTax [sfDir] [runs]
  */
object SeamTax {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .appName("graft-seamtax")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.functions.register(spark)
    spark.range(1000000).selectExpr("sum(id)").collect() // JVM warmup

    // the three loop/barrier families the flag switches: the prefix
    // jaccard join (eager pins + fan-out), CC (lazy per-round pins),
    // pageRank (lazy pins + broadcast rounds)
    def jaccard(): Long = {
      // the q_ngram_jaccard base, from its one spelling
      val docs = graft.queries.TextQueries.jaccardBase(
        spark.read.parquet(s"$dir/documents.parquet"))
      graft.operators.Dedup.jaccardSelfJoin(
        docs, "doc_id", "words", Seq("lang", "size_bucket"), 1, 4).count()
    }
    def cc(): Long = {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .selectExpr("doc_id")
      val edges = spark.read.parquet(s"$dir/documents.parquet")
        .selectExpr("doc_id doc_a", "doc_id + 1 doc_b")
        .where("doc_id % 3 != 0")
      graft.operators.Dedup.connectedComponents(docs, edges).count()
    }
    def pr(): Long = {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .selectExpr("doc_id id")
      val edges = spark.read.parquet(s"$dir/documents.parquet")
        .selectExpr("doc_id src", "doc_id + 1 dst")
        .where("doc_id % 3 != 0")
      graft.operators.GraphOps.pageRank(docs, edges, iters = 3).count()
    }
    val ops: Seq[(String, () => Long)] =
      Seq("jaccardSelfJoin" -> (() => jaccard()),
        "connectedComponents" -> (() => cc()),
        "pageRank" -> (() => pr()))

    def bestOf(f: () => Long): (Double, Long) = {
      var best = Double.MaxValue
      var rows = 0L
      for (_ <- 1 to runs) {
        val t0 = System.nanoTime()
        rows = f()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(false))
        spark.catalog.clearCache()
      }
      (best, rows)
    }

    val key = graft.operators.Checkpoints.ReliableDirKey
    val ckptDir = java.nio.file.Files
      .createTempDirectory("graft-seamtax").toString
    for ((name, f) <- ops) {
      spark.conf.unset(key)
      val (localSec, localRows) = bestOf(f)
      spark.conf.set(key, ckptDir)
      val (reliableSec, reliableRows) = bestOf(f)
      spark.conf.unset(key)
      require(localRows == reliableRows,
        s"$name rows diverged: $localRows vs $reliableRows")
      println(f"[seamtax] $name%-20s local $localSec%7.3f s  " +
        f"reliable $reliableSec%7.3f s  tax ${reliableSec / localSec}%5.2fx" +
        f"  (rows $localRows, best-of-$runs)")
    }
    spark.stop()
  }
}
