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
    // ERROR, not WARN: the bench's one-line JSON contract wants a clean
    // tail, and the WARN class here is all known noise — localCheckpoint
    // unpersists between queries (intended; see timeOne's finally),
    // function re-registration, truncated plan strings. The bench's own
    // diagnostics go through System.err.println and are unaffected.
    spark.sparkContext.setLogLevel("ERROR")
    // once per session; operator-level register calls are idempotent no-ops
    graft.functions.functions.register(spark)

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
    // 1-minute system load average at the moment each query's BEST sample
    // finished — the "was this number taken under external load?" stamp
    val loadAtBest = scala.collection.mutable.Map.empty[String, Double]
    val failedQ = scala.collection.mutable.Set.empty[String]
    val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean

    def timeOne(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Option[Double] = {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        val t = (System.nanoTime() - t0) / 1e9
        if (t < best.getOrElse(name, Double.MaxValue)) {
          best(name) = t
          loadAtBest(name) = os.getSystemLoadAverage
        }
        failedQ -= name // any successful pass clears earlier failures
        Some(t)
      } catch {
        case e: Throwable =>
          // a failure only marks the query failed while NO pass has
          // succeeded (and a later success un-marks it): neither a flaky
          // early pass nor a failed solo outlier rerun may erase a valid
          // best-of-N measurement
          if (!best.contains(name)) failedQ += name
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          None
      } finally {
        // release blocks pinned by this query (localCheckpoints, cached
        // plans) so earlier queries' leftovers can't slow later ones —
        // measured 3-4x inflation on checkpoint-heavy queries without this
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        spark.catalog.clearCache()
      }
    }

    for (_ <- 1 to runs; (name, fn) <- ordered) timeOne(name, fn)

    // contention self-defense: both interleaved samples of a query can
    // still land inside one long external-load burst (it happened to two
    // whole battery passes in a row). Any query whose best-of-N exceeds
    // 3x its previous round's time is re-run once, solo, at the end —
    // minutes later, when a burst has likely passed — and BOTH numbers
    // are recorded so the reader can see the burst rather than infer it.
    val prev = previousRound()
    val rerun = scala.collection.mutable.Map.empty[String, Double]
    for {
      (name, fn) <- ordered
      if !failedQ(name)
      p <- prev.get(name)
      if p > 0 && best.get(name).exists(_ > 3 * p)
    } {
      val before = best(name)
      timeOne(name, fn)
      rerun(name) = before // the contaminated number, kept for the record
    }

    // a failed query must not report its time-to-error as a result
    val results = ordered.map { case (name, _) =>
      name -> (if (failedQ(name)) -1.0 else best(name))
    }
    def jmap(m: Seq[(String, Double)]): String =
      m.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val qs = jmap(results)
    val loads = jmap(results.map { case (k, _) =>
      k -> loadAtBest.getOrElse(k, -1.0) })
    val reruns = jmap(rerun.toSeq.sorted)
    // failed queries (−1 markers) are excluded from the headline total so
    // an error can never improve the reported aggregate
    val failedCount = results.count(_._2 < 0)
    val total = results.map(_._2).filter(_ >= 0).sum
    val line = f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"load":$loads,"outlier_rerun":$reruns,"failed":$failedCount,"sf":"$sfDir"}"""
    // The full per-query/load/rerun line goes ONLY to BENCH_LOCAL.json
    // (VERDICT r10 #4): printing the ~8 KB map to stdout — first OR
    // last — overflowed the driver's fixed-size tail capture five rounds
    // running ("parsed": null). Stdout carries nothing but the slim
    // summary line below.
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_LOCAL.json"),
      (line + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write BENCH_LOCAL.json: $e") }
    // Stop BEFORE the final line so Spark's shutdown logging cannot land
    // after it: the LAST stdout line (before sbt's own footer) is then
    // always one complete JSON object, un-prefixed thanks to
    // `run / outputStrategy := StdoutOutput` in build.sbt.
    // BENCH_LOCAL.json holds the full per-query/load/rerun detail.
    spark.stop()
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","failed":$failedCount,"sf":"$sfDir","full":"BENCH_LOCAL.json"}""")
  }

  /** Per-query seconds from the newest BENCH_r*.json in the working
    * directory (the driver writes one per round there); empty when absent
    * or unparsable — outlier detection then simply never fires. */
  private def previousRound(): Map[String, Double] = {
    val Round = """BENCH_r(\d+)\.json""".r
    val files = Option(new java.io.File(".").listFiles()).getOrElse(Array.empty)
      .flatMap(f => f.getName match {
        // toLongOption: an absurdly-numbered stray file must be skipped,
        // not crash the bench ("empty when unparsable" contract)
        case Round(n) => n.toLongOption.map(_ -> f)
        case _ => None
      })
    // numeric round sort: lexicographic name order would pick r9 over r10
    files.sortBy(_._1).lastOption.map(_._2).flatMap { f =>
      try {
        import org.json4s._
        val text = new String(
          java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
        org.json4s.jackson.JsonMethods.parse(text) \ "queries" match {
          case JObject(kvs) => Some(kvs.collect {
            case (k, JDouble(v)) => k -> v
            case (k, JDecimal(v)) => k -> v.toDouble
            case (k, JInt(v)) => k -> v.toDouble
          }.toMap)
          case _ => None
        }
      } catch { case _: Throwable => None }
    }.getOrElse(Map.empty)
  }
}
