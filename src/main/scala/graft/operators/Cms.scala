package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan 2005) for heavy-hitter /
  * frequency estimation over unbounded key domains, built from
  * engine-portable primitives so the COUNTERS — the sketch state —
  * replay bit-identically in any engine with md5 and integer ops (the
  * [[Hll]] discipline):
  *
  *   h_i(x)        = first 60 bits of md5(i || ":" || x)
  *   col           = h_i(x) mod Width
  *   counter[i][col] += weight     for every row i in 0..Depth-1
  *   estimate(x)   = min over i of counter[i][h_i(x) mod Width]
  *
  * Every counter is an exact integer sum, so the full d×w grid is
  * oracle-checkable (DuckDB derives identical hashes from the same md5
  * prefixes), and the estimator is an integer min — no float anywhere.
  * CMS guarantees estimate ≥ true count, with overshoot ≤ 2·N/w at
  * probability 1 − (1/2)^d; the spec checks both bounds.
  *
  * 100 TB shape: this sketch is why you'd use CMS over an exact
  * `groupBy(term).count()` for frequency queries — counters
  * partial-aggregate map-side down to ≤ d·w rows per group per
  * partition, so the one shuffle carries (groups × 256) tiny rows
  * regardless of how many distinct terms the corpus holds, where the
  * exact count shuffles every distinct term. Sketches built from
  * disjoint corpus loads merge by element-wise counter SUM, so
  * incremental ingest unions for free (no rescan), and a streaming twin
  * is state-bounded by construction.
  */
object Cms {

  /** d = 4 hash rows: error probability (1/2)^4 ≈ 6%. */
  val Depth = 4

  /** w = 64 columns: overshoot ≤ 2N/64 of the total stream weight.
    * Small enough that the whole 4×64 grid rides a battery output and
    * is auditable by eye; production would size w ≈ 2/ε. */
  val Width = 64

  /** 60-bit row-seeded integer hash both engines compute identically. */
  private def h60(row: Column, value: Column): Column =
    conv(substring(md5(concat(row.cast("string"), lit(":"),
      value.cast("string"))), 1, 15), 16, 10).cast("long")

  /** Per-(group, row, col) counter cells. Only touched cells get a row
    * (absent cell = 0, restored by [[estimate]]'s left join): the state
    * stays ≤ d·w rows per group after the map-side partial aggregate. */
  def registers(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      weight: Column = lit(1L)): DataFrame = {
    val rows = array((0 until Depth).map(lit): _*)
    df.na.drop(Seq(valueCol))
      .withColumn("__w", weight)
      .withColumn("row", explode(rows))
      .withColumn("col",
        pmod(h60(col("row"), col(valueCol)), lit(Width.toLong)).cast("int"))
      .groupBy((groupCols.map(col) :+ col("row") :+ col("col")): _*)
      .agg(sum(col("__w")).as("counter"))
  }

  /** Merge sketches down to a coarser grouping by counter SUM — the CMS
    * merge law: sketch(A ⊎ B) = elementwise-sum(sketch(A), sketch(B)).
    * The incremental-ingest story: each load keeps its own ≤ d·w-cell
    * sketch and any union (per source, per day, global) is an aggregate
    * over tiny rows, never a corpus rescan. Pass the subset of grouping
    * columns to keep (empty = one global sketch). */
  def merge(regs: DataFrame, groupCols: Seq[String]): DataFrame =
    regs.groupBy((groupCols.map(col) :+ col("row") :+ col("col")): _*)
      .agg(sum(col("counter")).as("counter"))

  /** Point-estimate the frequency of each item in `items` (a DataFrame
    * with `itemCol`, plus any passthrough columns) from a sketch built
    * by [[registers]] with no group columns: estimate = min over the d
    * rows of the addressed counter, 0 when the cell was never touched.
    *
    * The items side is expected to be small (a candidate list — heavy
    * hitters, a watchlist); the sketch side is ≤ d·w rows, so both
    * sides of the join broadcast and the estimate costs no shuffle at
    * any corpus size.
    */
  def estimate(
      regs: DataFrame,
      items: DataFrame,
      itemCol: String): DataFrame = {
    val rows = array((0 until Depth).map(lit): _*)
    val addressed = items
      .withColumn("row", explode(rows))
      .withColumn("col",
        pmod(h60(col("row"), col(itemCol)), lit(Width.toLong)).cast("int"))
    addressed
      .join(broadcast(regs), Seq("row", "col"), "left")
      .na.fill(0L, Seq("counter"))
      .groupBy(col(itemCol))
      .agg(min(col("counter")).as("cms_estimate"))
  }
}
