package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator from SURVEY §2 (plus the
  * LLM-pipeline extensions) to a DataFrame plan over the driver's parquet
  * tables; `oracleSql` holds the DuckDB-equivalent SQL for the
  * hash-compared correctness gate. Column names are aliased identically on
  * both sides.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    AnalyticsQueries.queries("q1_pricing_summary")(
      spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ArchiveQueries.queries ++
      AnalyticsQueries.queries ++
      TextQueries.queries ++
      VectorQueries.queries ++
      PipelineQueries.queries ++
      TemporalQueries.queries ++
      ScalarQueries.queries ++
      CurationQueries.queries

  def oracleSql: Map[String, String] =
    ArchiveQueries.oracleSql ++
      AnalyticsQueries.oracleSql ++
      TextQueries.oracleSql ++
      VectorQueries.oracleSql ++
      PipelineQueries.oracleSql ++
      TemporalQueries.oracleSql ++
      ScalarQueries.oracleSql ++
      CurationQueries.oracleSql
}
