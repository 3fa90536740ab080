package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only profiling harness: time the phases of one battery query in
  * isolation (candidate generation vs. iterative closure) so perf work
  * targets the real bottleneck instead of the battery total.
  *
  * Usage: sbt "runMain graft.tools.Profile /root/testdata/sf0.1"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .appName("graft-profile")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    graft.functions.functions.register(spark)

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    val docs = graft.queries.Tables.read(spark, dir, "documents")
    val base = docs.select(
      $"doc_id", $"lang", expr("n_chars div 100").cast("int").as("size_bucket"),
      array_distinct(split(lower(trim($"text")), "\\s+")).as("words"))
      .withColumn("n_words", size($"words"))
    val words = base.select($"doc_id", $"lang", $"size_bucket", $"n_words",
      explode($"words").as("word"))
    val a = words.toDF("doc_a", "lang", "size_bucket", "n_a", "word")
    val b = words.toDF("doc_b", "lang", "size_bucket", "n_b", "word")
    val pairs = a.join(b, Seq("lang", "size_bucket", "word"))
      .filter($"doc_a" < $"doc_b")
      .groupBy($"doc_a", $"doc_b", $"n_a", $"n_b")
      .agg(count(lit(1)).cast("int").as("inter_size"))
      .filter($"inter_size" * 4 >= $"n_a" + $"n_b" - $"inter_size")
      .select($"doc_a", $"doc_b")

    val edges = timed("candidate pairs (count)") { pairs.localCheckpoint() }
    println(s"[profile] edges = ${edges.count()}  vertices = ${docs.count()}")

    val cc = timed("connectedComponents") {
      val r = graft.operators.Dedup.connectedComponents(
        docs.select($"doc_id"), edges)
      r.count()
      r
    }
    timed("repeat (warm)") {
      graft.operators.Dedup.connectedComponents(
        docs.select($"doc_id"), edges).count()
    }
    val nClusters = cc.select(countDistinct($"cluster_id")).as[Long].head()
    println(s"[profile] clusters = $nClusters")
    spark.stop()
  }
}
