package graft.store

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Bucketed-table co-location: writing both join sides bucketed by the
  * join key lets Spark sort-merge-join them with NO exchange — the
  * pre-shuffled layout big fact-to-fact joins need at 100 TB (SCALE.md).
  */
class BucketingSpec extends SparkSuite {

  test("join of co-bucketed tables plans without a shuffle") {
    import spark.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    val orders = (1L to 2000L).map(i => (i, s"o$i")).toDF("key", "o_payload")
    val lines = (1L to 6000L).map(i => (i % 2000 + 1, s"l$i"))
      .toDF("key", "l_payload")

    orders.write.mode("overwrite")
      .bucketBy(8, "key").sortBy("key")
      .saveAsTable("orders_bucketed")
    lines.write.mode("overwrite")
      .bucketBy(8, "key").sortBy("key")
      .saveAsTable("lines_bucketed")

    val joined = spark.table("orders_bucketed")
      .join(spark.table("lines_bucketed"), "key")
    val plan = joined.queryExecution.executedPlan.toString

    assert(plan.contains("SortMergeJoin"))
    // co-located buckets ⇒ no Exchange anywhere in the join plan
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    assert(joined.count() === 6000)

    // contrast: the same join over plain (unbucketed) tables shuffles
    orders.write.mode("overwrite").saveAsTable("orders_plain")
    lines.write.mode("overwrite").saveAsTable("lines_plain")
    val plainPlan = spark.table("orders_plain")
      .join(spark.table("lines_plain"), "key")
      .queryExecution.executedPlan.toString
    assert(plainPlan.contains("Exchange"))

    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
