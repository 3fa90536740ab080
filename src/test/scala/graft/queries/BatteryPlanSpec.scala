package graft.queries

import graft.SparkSuite

/** Battery-wide plan regression gate: every SparkEntry query must build
  * its plan, and no plan may contain an unbounded CartesianProduct —
  * the one join shape that cannot survive a 100× scale-up. The check
  * matches on the plan STRING because under AQE the executed plan is an
  * AdaptiveSparkPlanExec LEAF (its pre-execution children are empty, so
  * a node-type `collect` finds nothing — verified empirically: a
  * crossJoin's CartesianProductExec is invisible to collect with AQE on
  * but present in `toString`). Broadcast nested-loop joins stay
  * allowed: the battery's deliberate crossJoins (query × k centroids,
  * query × hyperplanes) broadcast a tiny, size-bounded side.
  *
  * Plan construction is NOT free for every query — the ANN entries
  * build their cell index and the BPE/winnow entries run their eager
  * training/materialization steps — so this doubles as a smoke test
  * that each query's driver-side setup works at sf0.001. */
class BatteryPlanSpec extends SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"

  test("all battery queries plan; none contains a cartesian product") {
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    for ((name, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct"))
          failures += s"$name: CartesianProduct in plan"
        // design invariants the battery promises (README/SCALE.md):
        // no Scala UDFs (codegen'd builtins + native expressions only —
        // UDFs break whole-stage codegen and add per-row serialization)
        if (plan.contains("UDF("))
          failures += s"$name: Scala UDF in plan"
        // and no interpreted aggregate(zip_with(...)) dot products — the
        // vector paths must stay on the native vector_dot expression
        if (plan.contains("aggregate(zip_with"))
          failures += s"$name: interpreted aggregate(zip_with(...)) dot"
      } catch {
        case e: Exception => failures += s"$name: failed to plan: ${e.getMessage}"
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("the gate itself sees a cartesian product when one exists") {
    // guard against the gate going vacuous again (e.g. a future plan
    // representation change): a genuine cartesian join must trip it
    val a = spark.range(3).toDF("x")
    val b = spark.range(3).toDF("y")
    // the hint pins CartesianProductExec (tiny sides would otherwise
    // broadcast into the allowed BNLJ shape)
    val plan = a.hint("shuffle_replicate_nl").crossJoin(b).orderBy("x")
      .queryExecution.executedPlan.toString
    assert(plan.contains("CartesianProduct"),
      s"canary cartesian product not visible in:\n$plan")
  }
}
