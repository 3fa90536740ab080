package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only (VERDICT r17 #3 / r18 scaling evidence): build a K×
  * replica of the sf-dir tables the top-floor queries read, so the
  * battery can be measured where DATA outweighs per-job overhead —
  * sf0.1's documents table is 5,000 rows (~2.5 MB of text), which is
  * why the 8-core battery beats the 32-core one at that SF.
  *
  * Replication is WORK-HONEST for the similarity self-join family:
  * replica k > 0 gets every word prefixed `r<k>q` (disjoint vocabulary
  * per replica) and ids offset by k·10¹², so cross-replica pairs are
  * impossible by construction and total join work scales LINEARLY in K
  * — the engine sees K independent copies of the sf0.1 workload, which
  * is exactly the shape a K×-bigger crawl has (more blocks, not hotter
  * blocks). Plain row replication instead would pair identical texts
  * ACROSS replicas and grow candidate sets quadratically in K —
  * measuring the corpus's duplicate structure, not the engine.
  * lineitem/embeddings get plain id offsets (no self-joins there).
  *
  * NOT an oracle dir: scaling runs read it via SPARK_GRAFT_SF_DIR for
  * subset benches only (the bench refuses to seed a composite archive
  * from a subset run, and non-canonical sf dirs are name-suffixed).
  *
  * Usage: runMain graft.tools.ScaleGen <srcDir> <outDir> <K>
  */
object ScaleGen {
  private val Stride = 1000000000000L

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleGen <srcDir> <outDir> <K>")
    val Array(src, out, kStr) = args
    val k = kStr.toInt
    require(k >= 1, s"K must be >= 1, got $k")
    val spark = SparkSession.builder()
      .appName("graft-scalegen")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // events ships ns-precision timestamps in some generations
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def replicate(name: String, idCols: Seq[String],
        perReplica: (DataFrame, Int) => DataFrame): Unit = {
      val base = spark.read.parquet(s"$src/$name.parquet")
      val union = (0 until k).map { r =>
        val shifted = idCols.foldLeft(perReplica(base, r)) { (df, c) =>
          df.withColumn(c, col(c) + lit(r * Stride))
        }
        shifted
      }.reduce(_.unionByName(_))
      // a handful of real row groups so scans split without the
      // Tables.read repartition probe firing
      union.repartition(32).write.mode("overwrite")
        .parquet(s"$out/$name.parquet")
      println(s"[scalegen] $name x$k -> $out/$name.parquet")
    }

    // documents: disjoint vocabulary per replica (word prefix r<k>q);
    // n_chars kept consistent with the rewritten text
    replicate("documents", Seq("doc_id"), (df, r) =>
      if (r == 0) df
      else df.withColumn("text",
          regexp_replace(col("text"), "(\\S+)", s"r${r}q$$1"))
        .withColumn("n_chars", length(col("text")).cast("long")))
    replicate("embeddings", Seq("vec_id"), (df, _) => df)
    replicate("lineitem", Seq("l_orderkey"), (df, _) => df)
    replicate("events", Seq("event_id"), (df, _) => df)
    spark.stop()
  }
}
