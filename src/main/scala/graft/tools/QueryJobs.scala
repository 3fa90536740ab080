package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: job-level accounting for any battery query — the
  * `q_neardup_probe` treatment ([[ProbeLegs]]) generalized. Runs the
  * named query twice (warm + measured) through the bench's noop sink
  * and prints every Spark action the measured run fires with its wall
  * seconds, so "is this one real stage or many fixed-overhead jobs?"
  * is answered by data instead of plan-reading.
  *
  * Usage: runMain graft.tools.QueryJobs <query> [sfDir] [runs]
  */
object QueryJobs {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QueryJobs <query> [sfDir] [runs]")
    val name = args(0)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(2).map(_.toInt).getOrElse(2)
    val fn = graft.SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query $name"))
    val spark = SparkSession.builder()
      .appName("graft-queryjobs")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.functions.register(spark)
    spark.range(1000000).selectExpr("sum(id)").collect() // JVM warmup

    def once(): Double = {
      val t0 = System.nanoTime()
      fn(spark, dir).write.mode("overwrite").format("noop").save()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.catalog.clearCache()
      sec
    }

    for (i <- 1 until runs)
      println(f"[queryjobs] $name warm#$i ${once()}%7.3f s")

    val listener = new graft.Profile.JobTimes
    spark.sparkContext.addSparkListener(listener)
    val measured = once()
    spark.sparkContext.removeSparkListener(listener)
    Thread.sleep(500)
    val jobTimes = listener.snapshot()
    jobTimes.zipWithIndex.foreach { case ((d, t), i) =>
      println(f"[queryjobs]   job#$i%-3d $t%7.3f s  ${d.take(100)}")
    }
    println(f"[queryjobs] $name measured ${measured}%7.3f s, " +
      f"${jobTimes.size} jobs, job-sum ${jobTimes.map(_._2).sum}%7.3f s")
    spark.stop()
  }
}
