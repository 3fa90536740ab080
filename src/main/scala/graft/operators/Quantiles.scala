package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed order statistics without a per-group global sort.
  *
  * `row_number() OVER (PARTITION BY grp ORDER BY v)` materializes and
  * sorts every group in ONE task — with a handful of groups that is a
  * handful of tasks regardless of cluster size, the textbook anti-scale
  * window shape. This operator finds exact kth-smallest values with the
  * classic bucket-and-refine selection:
  *
  *   1. histogram: count per (group, value) — parallel, collapses dups
  *   2. coarse buckets: sum counts per (group, value div bucketWidth);
  *      a running total over the few-thousand-row bucket table locates,
  *      for each requested rank k, THE bucket containing the kth value
  *   3. refine: re-scan only the located buckets' histogram rows (a
  *      broadcast semi-join) and take a running total within each — the
  *      windows here cover one bucket's values, never a whole group
  *
  * Every pass is a hash aggregate or a window over bounded input, so the
  * plan parallelizes with the data instead of with the group count.
  * Results are exact multiset order statistics (1-indexed rank k ⇒ the
  * value v with cum(< v) < k ≤ cum(≤ v)) — identical to the sort-based
  * definition, bit-for-bit, in pure integer arithmetic.
  */
object Quantiles {

  /** Exact kth-smallest `valCol` values per `grpCol` group, one row per
    * (group, requested rank). `ranks` maps a label to the 1-indexed rank
    * as an integer expression over the group-size column `__n`
    * (e.g. median ⇒ `expr("(__n + 1) div 2")`). `valCol` must be
    * integral; `bucketWidth` trades bucket-table size against
    * refine-window size (default 4096 values per bucket).
    */
  def exactKth(
      df: DataFrame,
      grpCol: String,
      valCol: String,
      ranks: Seq[(String, Column)],
      bucketWidth: Long = 4096L): DataFrame = {
    require(ranks.nonEmpty, "at least one rank is required")
    // the refine window partitions by (group, label): a duplicate label
    // would mix two buckets' rows in one partition and silently corrupt
    // the cumulative counts
    require(ranks.map(_._1).distinct.size == ranks.size,
      s"rank labels must be distinct, got ${ranks.map(_._1).mkString(", ")}")
    require(bucketWidth > 0, "bucketWidth must be positive")
    val g = col(grpCol)
    val v = col(valCol)

    // 1. value histogram + coarse bucket id (exact integer FLOOR
    // division — Column.divide is floating-point, and truncating DIV
    // would misorder negative values' buckets)
    val bktExpr = expr(
      s"CASE WHEN $valCol >= 0 THEN ($valCol DIV $bucketWidth) * $bucketWidth " +
        s"ELSE -((-$valCol + $bucketWidth - 1) DIV $bucketWidth) * $bucketWidth END")
    // NOT persisted: the histogram feeds both the bucket-locating
    // chain and the refine join, but a persist here has no unpersist
    // path (the returned frame is lazy) and would leak one cached
    // block set per call in a long-lived session. Callers whose
    // upstream is expensive pin THEIR input instead (the
    // keepAboveQuantile pattern: cache, take the 1-row threshold
    // eagerly, unpersist).
    val hist = df.groupBy(g, v).agg(count(lit(1)).as("__cnt"))
      .withColumn("__bkt", bktExpr)

    // 2. bucket table: counts, group totals, running total before bucket
    val bkts = hist.groupBy(g, col("__bkt"))
      .agg(sum(col("__cnt")).as("__bcnt"))
    val wBkt = Window.partitionBy(g).orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bktCum = bkts
      .withColumn("__cum_thru", sum(col("__bcnt")).over(wBkt))
      .withColumn("__before", col("__cum_thru") - col("__bcnt"))
      .withColumn("__n", sum(col("__bcnt"))
        .over(Window.partitionBy(g)))

    // one row per (group, label): the rank k and its containing bucket
    val targets = ranks.map { case (label, kCol) =>
      bktCum
        .withColumn("__k", kCol)
        .where(col("__before") < col("__k") &&
          col("__k") <= col("__cum_thru"))
        .select(g, col("__bkt"), lit(label).as("__label"),
          col("__k"), col("__before"))
    }.reduce(_ unionByName _)

    // 3. refine inside the located buckets only: running multiset total
    // within (group, label, bucket) — window input is one bucket's values
    val wIn = Window.partitionBy(g, col("__label")).orderBy(v)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist.join(broadcast(targets), Seq(grpCol, "__bkt"))
      .withColumn("__cum_in", sum(col("__cnt")).over(wIn) + col("__before"))
      .where(col("__cum_in") - col("__cnt") < col("__k") &&
        col("__k") <= col("__cum_in"))
      .select(g, col("__label").as("label"), v.as("value"))
  }
}
