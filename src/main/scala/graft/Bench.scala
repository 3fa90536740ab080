package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line with per-query wall
  * seconds. Results are materialized through the noop sink so the full
  * plan (including projections that `count()` would prune away) executes.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JVM + codegen warmup on a trivial job so the first timed query does
    // not absorb session startup
    spark.range(1000000).selectExpr("sum(id)").collect()

    val selected =
      if (args.nonEmpty) SparkEntry.queries.view.filterKeys(args.toSet).toMap
      else SparkEntry.queries
    args.filterNot(SparkEntry.queries.keySet).foreach(a =>
      System.err.println(s"[bench] unknown query name ignored: $a"))
    // best-of-N per query (default 2), measured as N INTERLEAVED battery
    // passes rather than N back-to-back runs per query: this box shows
    // multi-minute external contention windows, and back-to-back samples
    // of one query both land inside the same window (observed 30x
    // inflation on its best-of-3). Round-robin puts a query's samples
    // ~minutes apart, so its min dodges any window shorter than a pass.
    // The first pass also pays plan compilation + codegen, so later
    // passes measure steady-state throughput.
    val runs = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt)
    val ordered = selected.toSeq.sortBy(_._1)
    val best = scala.collection.mutable.Map.empty[String, Double]
    val failedQ = scala.collection.mutable.Set.empty[String]
    for (_ <- 1 to runs; (name, fn) <- ordered) {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        val t = (System.nanoTime() - t0) / 1e9
        best(name) = math.min(best.getOrElse(name, Double.MaxValue), t)
      } catch {
        case e: Throwable =>
          failedQ += name
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      // release blocks pinned by this query (localCheckpoints, cached
      // plans) so earlier queries' leftovers can't slow later ones —
      // measured 3-4x inflation on checkpoint-heavy queries without this
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.catalog.clearCache()
    }
    // a failed query must not report its time-to-error as a result
    val results = ordered.map { case (name, _) =>
      name -> (if (failedQ(name)) -1.0 else best(name))
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    // failed queries (−1 markers) are excluded from the headline total so
    // an error can never improve the reported aggregate
    val failedCount = results.count(_._2 < 0)
    val total = results.map(_._2).filter(_ >= 0).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$failedCount,"sf":"$sfDir"}""")
    spark.stop()
  }
}
