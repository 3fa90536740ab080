package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.CartesianProductExec

/** Battery-wide plan regression gate: every SparkEntry query must PLAN
  * (catches analysis/optimizer breakage across all 68 without running
  * them) and no plan may contain an unbounded CartesianProductExec —
  * the one join shape that cannot survive a 100× scale-up. Broadcast
  * nested-loop joins are allowed: the battery's deliberate crossJoins
  * (query × k centroids, query × hyperplanes) broadcast a tiny,
  * size-bounded side. */
class BatteryPlanSpec extends SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"

  test("all battery queries plan; none contains a cartesian product") {
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    for ((name, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val plan: SparkPlan = fn(spark, sfDir).queryExecution.executedPlan
        val cartesian = plan.collect { case c: CartesianProductExec => c }
        if (cartesian.nonEmpty)
          failures += s"$name: CartesianProductExec in plan"
      } catch {
        case e: Exception => failures += s"$name: failed to plan: ${e.getMessage}"
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
