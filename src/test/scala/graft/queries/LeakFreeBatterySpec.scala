package graft.queries

import graft.SparkSuite

/** Battery-wide cache-leak gate (VERDICT r11 next-round #8): every
  * registered query is run ONCE to completion at sf0.001 and must leave
  * no persisted frames behind. The r11 leak class — langId,
  * keepAboveQuantile, exactKth, q_gate_dedup_pipeline: operators that
  * `.persist()` an intermediate and return a LAZY frame with no
  * unpersist path — was found by review, not by a test; this suite
  * makes the discipline mechanical.
  *
  * The contract enforced: after one full materialization of a query's
  * result, `getPersistentRDDs` may contain only LOCALLY-CHECKPOINTED
  * blocks. localCheckpoint pins are the sanctioned frame-freezing tool
  * (Bpe/Dedup/CellIndex pin batch-sized frames with it) and the
  * ContextCleaner reclaims them after the frame is garbage-collected;
  * a `.persist()` with no unpersist path lives until the session dies —
  * that is the leak. */
class LeakFreeBatterySpec extends SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"

  test("no battery query leaks persisted frames into a long-lived " +
    "session (locally-checkpointed blocks excepted)") {
    graft.functions.functions.register(spark)
    // other suites share this JVM's session — start from a clean slate
    // so their pins can't be blamed on the first query here
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    spark.catalog.clearCache()
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    for ((name, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        val leaked = spark.sparkContext.getPersistentRDDs.values
          .filterNot(_.isCheckpointed)
        if (leaked.nonEmpty)
          offenders += s"$name: ${leaked.size} persisted non-checkpoint " +
            s"RDD(s): ${leaked.map(_.name).mkString(", ")}"
      } catch {
        case e: Exception => offenders += s"$name: failed to run: " +
          s"${e.getMessage}"
      } finally {
        // release everything (including sanctioned localCheckpoints)
        // before the next query — the Bench discipline: one query's
        // pins must never slow or implicate the next
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(false))
        spark.catalog.clearCache()
      }
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("the gate itself sees a leak when one exists") {
    // canary: a persisted-and-materialized frame with no unpersist must
    // trip the same detector the battery loop uses
    val pinned = spark.range(100).toDF("x").persist()
    pinned.write.mode("overwrite").format("noop").save()
    val leaked = spark.sparkContext.getPersistentRDDs.values
      .filterNot(_.isCheckpointed)
    assert(leaked.nonEmpty, "canary leak not visible to the detector")
    pinned.unpersist(false)
    val after = spark.sparkContext.getPersistentRDDs.values
      .filterNot(_.isCheckpointed)
    assert(after.isEmpty, "unpersist must clear the canary")
  }
}
