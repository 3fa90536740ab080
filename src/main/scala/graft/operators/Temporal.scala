package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal operators the reference's time-bucket model generalizes to and
  * Spark lacks as builtins: as-of join, interval-overlap range join, and
  * sessionization. All are composed from existing operators (preference
  * (a) of the custom-operator ladder) so Catalyst keeps optimizing them.
  */
object Temporal {

  /** Backward as-of join: for each left row, the single latest right row
    * with `rightTime <= leftTime`, per key.
    *
    * Implemented as union + ordered window + `last(_, ignoreNulls)`: ONE
    * shuffle on the key and a within-partition sort — no range explosion,
    * no per-row probing, the classic scalable shape (a sort-merge as-of).
    * Rows on both sides must have unique (key, time) for determinism —
    * pre-aggregate the right side if not.
    *
    * @return left rows + `asof` struct column (null when no prior right
    *         row exists)
    */
  def asofJoinBackward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String): DataFrame = {
    val leftCols = left.columns
    val rStructType = org.apache.spark.sql.types.StructType(
      right.schema.fields)
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__is_left", lit(1))
      .withColumn("__rstruct", lit(null).cast(rStructType))
    // carry the right row as one struct column so the window needs a
    // single last() regardless of right's schema
    val r = right
      .withColumn("__t", col(rightTime))
      .withColumn("__is_left", lit(0))
      .select(col(key), col("__t"), col("__is_left"),
        struct(right.columns.map(col).toIndexedSeq: _*).as("__rstruct"))
    val lAligned = l.select(
      (Seq(col(key), col("__t"), col("__is_left"), col("__rstruct")) ++
        leftCols.filterNot(_ == key).map(c => col(c))): _*)
    // right rows sort before left rows at equal time (tag 0 < 1), so a
    // right row at exactly leftTime is visible to the left row
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val unioned = lAligned.unionByName(
      r.select((Seq(col(key), col("__t"), col("__is_left"), col("__rstruct")) ++
        leftCols.filterNot(_ == key).map(c => lit(null).as(c))): _*))
    unioned
      .withColumn("asof", last(col("__rstruct"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)
      .drop("__t", "__is_left", "__rstruct")
  }

  /** Interval-overlap self/range join via day-bucket blocking — the
    * reference's J1 trick applied to joins: explode each interval into
    * the buckets it spans, equi-join on (key, bucket), verify the exact
    * overlap predicate, dedup pairs that met in several buckets.
    * Intermediate size is |rows| × avg-span, not |rows|², and the
    * equi-join shuffles instead of nested-looping.
    */
  def overlapJoin(
      a: DataFrame,
      b: DataFrame,
      key: String,
      startCol: String,
      endCol: String,
      bucketMs: Long = 86400000L,
      pairFilter: Column = lit(true)): DataFrame = {
    def explodeBuckets(df: DataFrame, prefix: String): DataFrame =
      df.columns.foldLeft(df)((d, c) =>
        d.withColumnRenamed(c, if (c == key) c else s"$prefix$c"))
        .withColumn("__bucket", explode(sequence(
          expr(s"$prefix$startCol div $bucketMs"),
          expr(s"$prefix$endCol div $bucketMs"))))
    val ae = explodeBuckets(a, "a_")
    val be = explodeBuckets(b, "b_")
    ae.join(be, Seq(key, "__bucket"))
      .filter(col(s"a_$startCol") <= col(s"b_$endCol") &&
        col(s"b_$startCol") <= col(s"a_$endCol"))
      .filter(pairFilter)
      .drop("__bucket")
      .distinct()
  }

  /** Gap-based sessionization: a new session starts when the gap since
    * the previous event (per key) exceeds `gapMs`. Pure window functions
    * (lag + running sum) — one shuffle on the key. */
  def sessionize(
      events: DataFrame,
      key: String,
      timeCol: String,
      gapMs: Long): DataFrame = {
    val byTime = Window.partitionBy(col(key)).orderBy(col(timeCol))
    events
      .withColumn("__prev", lag(col(timeCol), 1).over(byTime))
      .withColumn("__new_session",
        when(col("__prev").isNull ||
          col(timeCol) - col("__prev") > gapMs, 1).otherwise(0))
      .withColumn("session_id",
        sum(col("__new_session")).over(
          byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__prev", "__new_session")
  }
}
