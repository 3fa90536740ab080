package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only (VERDICT r17 #5): decompose the bench's ~0.15 s/query fixed
  * overhead. For each named query (default: a spread of the sub-0.5 s
  * floors) the probe times, on an already-warm session:
  *
  *   - construct: `fn(spark, dir)` returning the DataFrame — analysis
  *     of the logical plan (driver, single-thread)
  *   - plan:      forcing `queryExecution.executedPlan` — optimization
  *     + physical planning (driver, single-thread; excludes AQE re-opt,
  *     which happens during execution)
  *   - execute:   the noop-sink write (codegen + jobs + AQE)
  *
  * plus a floor reference: the same noop write over a trivial
  * `spark.range(1)` plan, which prices the irreducible
  * action-dispatch + commit round-trip. Two passes per query; the
  * SECOND pass is the steady-state number (pass 1 pays codegen and
  * fills the file-index and Tables.read probe caches, like the bench's
  * best-of-N).
  *
  * Usage: runMain graft.tools.OverheadProbe [sfDir] [query ...]
  */
object OverheadProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.filter(_.startsWith("/"))
      .getOrElse("/root/testdata/sf0.1")
    val names =
      if (args.length > 1 || (args.nonEmpty && !args(0).startsWith("/")))
        args.filterNot(_.startsWith("/")).toSeq
      else Seq("q_page_limit", "q_cursor_page", "q_time_interval",
        "q_workid_equality", "q_dedup_clusters", "q_iso8601",
        "q_date_parts", "q_split_assign", "q_label_centroid_stats",
        "q_pq_codes")
    val spark = SparkSession.builder()
      .appName("graft-overheadprobe")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.functions.register(spark)
    spark.range(1000000).selectExpr("sum(id)").collect() // JVM warmup

    def ms(t0: Long): Double = (System.nanoTime() - t0) / 1e6

    // the irreducible action round-trip: trivial plan, noop sink
    for (p <- 1 to 3) {
      val t0 = System.nanoTime()
      spark.range(1).write.mode("overwrite").format("noop").save()
      println(f"[overhead] range(1) noop pass#$p ${ms(t0)}%8.1f ms")
    }

    for (name <- names) {
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      for (p <- 1 to 2) {
        val c0 = System.nanoTime()
        val df = fn(spark, dir)
        val tConstruct = ms(c0)
        val p0 = System.nanoTime()
        df.queryExecution.executedPlan // force optimize + physical plan
        val tPlan = ms(p0)
        val e0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        val tExec = ms(e0)
        println(f"[overhead] $name%-24s pass#$p construct $tConstruct%8.1f  " +
          f"plan $tPlan%8.1f  exec $tExec%8.1f ms")
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
