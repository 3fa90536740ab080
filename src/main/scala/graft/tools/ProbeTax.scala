package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: measures the PRE-SAMPLE probe's perturbation of the
  * sample it precedes (ADVICE r16 #1: the ~4 GB all-core probe evicts
  * cache and briefly saturates the cores right before the timed query,
  * so it may systematically inflate the very number it contextualizes).
  *
  * Method: for each query, interleave two arms — (probe; time query)
  * and (time query bare) — and compare the per-arm MINIMA. Min-vs-min
  * is the same contention-robust estimator the bench's composite floors
  * use: external weather inflates both arms equally over enough
  * samples, so a persistent min-gap is attributable to the probe. The
  * target queries are the battery's cheapest (sub-second) entries —
  * the tax is a fixed cache/thermal effect, so the SHORTEST segments
  * bound it most tightly and show it proportionally largest.
  *
  * Usage: runMain graft.tools.ProbeTax [names...]   (default: a fast set)
  * One PROBETAX line per query + a closing JSON summary for PROFILE.md.
  */
object ProbeTax {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    spark.range(1000000).selectExpr("sum(id)").collect()

    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q_key_concat", "q_iso8601", "q_fingerprint",
        "q_strip_markup", "q_token_count")
    val samples = math.max(2,
      sys.env.getOrElse("SPARK_GRAFT_PROBETAX_RUNS", "9").toInt)

    def clearPins(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.catalog.clearCache()
    }
    def timeQuery(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      val t = (System.nanoTime() - t0) / 1e9
      clearPins()
      t
    }

    val rows = for (name <- names) yield {
      timeQuery(name) // warm: plan + codegen
      val probed = scala.collection.mutable.ArrayBuffer.empty[Double]
      val bare = scala.collection.mutable.ArrayBuffer.empty[Double]
      // ABBA pair ordering: strict alternation would put the probed arm
      // at a fixed phase of any periodic external burst; flipping the
      // order every pair cancels linear weather drift across the run
      for (pair <- 0 until samples) {
        def probedOne(): Unit = {
          graft.Bench.canaryParProbe(); probed += timeQuery(name)
        }
        def bareOne(): Unit = bare += timeQuery(name)
        if (pair % 2 == 0) { probedOne(); bareOne() }
        else { bareOne(); probedOne() }
      }
      val (pMin, bMin) = (probed.min, bare.min)
      println(f"PROBETAX q=$name probed_min=$pMin%.4f bare_min=$bMin%.4f " +
        f"tax_ms=${(pMin - bMin) * 1000}%.1f " +
        f"probed_med=${probed.sorted.apply(probed.size / 2)}%.4f " +
        f"bare_med=${bare.sorted.apply(bare.size / 2)}%.4f")
      (name, pMin, bMin)
    }
    println(rows.map { case (n, p, b) =>
      s""""$n":{"probed_min":${f"$p%.4f"},"bare_min":${f"$b%.4f"},""" +
        s""""tax_ms":${f"${(p - b) * 1000}%.1f"}}"""
    }.mkString("""{"metric":"probetax","queries":{""", ",",
      s"""},"samples":$samples,"sf":"$sfDir"}"""))
    spark.stop()
  }
}
