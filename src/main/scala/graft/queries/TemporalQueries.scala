package graft.queries

import graft.operators.Temporal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Temporal-operator battery over events: as-of join, interval-overlap
  * range join, sessionization, pivot — each oracle-checked against
  * DuckDB's native equivalents (ASOF JOIN, range predicate join, window
  * SQL, FILTER aggregates).
  */
object TemporalQueries {

  private def ev(s: SparkSession, dir: String): DataFrame =
    ArchiveQueries.ev(s, dir)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // as-of join: each purchase matched to the user's latest prior view
    "q_asof_join" -> ((s, dir) => {
      import s.implicits._
      val base = ev(s, dir)
      val purchases = base.filter($"event_type" === "purchase")
        .select($"user_id", $"event_id", $"start_ms")
      val views = base.filter($"event_type" === "view")
        .select($"user_id", $"event_id".as("view_event_id"),
          $"start_ms".as("view_start_ms"))
      Temporal.asofJoinBackward(purchases, views,
        key = "user_id", leftTime = "start_ms", rightTime = "view_start_ms")
        .select($"event_id", $"user_id", $"start_ms",
          $"asof.view_event_id".as("view_event_id"),
          ($"start_ms" - $"asof.view_start_ms").as("gap_ms"))
        .orderBy($"event_id")
    }),

    // interval-overlap range join via day-bucket blocking: pairs of
    // overlapping error intervals per user
    "q_overlap_join" -> ((s, dir) => {
      import s.implicits._
      val errors = ev(s, dir).filter($"event_type" === "error")
        .select($"user_id", $"event_id",
          $"start_ms", coalesce($"end_ms", $"start_ms").as("end_eff"))
      Temporal.overlapJoin(
        errors.toDF("user_id", "event_id", "start_ms", "end_eff"),
        errors.toDF("user_id", "event_id", "start_ms", "end_eff"),
        key = "user_id", startCol = "start_ms", endCol = "end_eff",
        pairFilter = col("a_event_id") < col("b_event_id"))
        .select(col("user_id"), col("a_event_id"), col("b_event_id"))
        .orderBy(col("user_id"), col("a_event_id"), col("b_event_id"))
    }),

    // gap-based sessionization (30-minute gap) + per-session rollup
    "q_sessionize" -> ((s, dir) => {
      import s.implicits._
      Temporal.sessionize(ev(s, dir), "user_id", "start_ms",
        gapMs = 30 * 60 * 1000L)
        .groupBy($"user_id", $"session_id")
        .agg(count(lit(1)).as("n_events"),
          min($"start_ms").as("session_start"),
          max($"start_ms").as("session_end"))
        .orderBy($"user_id", $"session_id")
    }),

    // pivot: per-day event-type counts as columns
    "q_pivot_daily" -> ((s, dir) => {
      import s.implicits._
      ev(s, dir)
        .withColumn("day_bucket", expr("start_ms div 86400000"))
        .groupBy($"day_bucket")
        .pivot("event_type",
          Seq("click", "error", "purchase", "signup", "view"))
        .count()
        .na.fill(0L)
        .toDF("day_bucket", "n_click", "n_error", "n_purchase",
          "n_signup", "n_view")
        .orderBy($"day_bucket")
    }))

  val oracleSql: Map[String, String] = Map(
    "q_asof_join" -> (ArchiveQueries.EvCte +
      """SELECT p.event_id, p.user_id, p.start_ms,
        |       v.view_event_id, p.start_ms - v.view_start_ms AS gap_ms
        |FROM (SELECT user_id, event_id, start_ms FROM ev
        |      WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN
        |     (SELECT user_id, event_id AS view_event_id,
        |             start_ms AS view_start_ms FROM ev
        |      WHERE event_type = 'view') v
        |  ON p.user_id = v.user_id AND v.view_start_ms <= p.start_ms
        |ORDER BY p.event_id""".stripMargin),

    "q_overlap_join" -> (ArchiveQueries.EvCte +
      """, err AS (
        |  SELECT user_id, event_id, start_ms,
        |         coalesce(end_ms, start_ms) AS end_eff
        |  FROM ev WHERE event_type = 'error')
        |SELECT a.user_id, a.event_id AS a_event_id, b.event_id AS b_event_id
        |FROM err a JOIN err b
        |  ON a.user_id = b.user_id AND a.event_id < b.event_id
        | AND a.start_ms <= b.end_eff AND b.start_ms <= a.end_eff
        |ORDER BY a.user_id, a_event_id, b_event_id""".stripMargin),

    "q_sessionize" -> (ArchiveQueries.EvCte +
      """, marked AS (
        |  SELECT user_id, start_ms,
        |    CASE WHEN lag(start_ms) OVER w IS NULL
        |           OR start_ms - lag(start_ms) OVER w > 1800000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY start_ms)),
        |sessions AS (
        |  SELECT user_id, start_ms,
        |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY start_ms
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS session_id
        |  FROM marked)
        |SELECT user_id, session_id, count(*) AS n_events,
        |       min(start_ms) AS session_start, max(start_ms) AS session_end
        |FROM sessions GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin),

    "q_pivot_daily" -> (ArchiveQueries.EvCte +
      """SELECT start_ms // 86400000 AS day_bucket,
        |  count(*) FILTER (WHERE event_type = 'click') AS n_click,
        |  count(*) FILTER (WHERE event_type = 'error') AS n_error,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
        |  count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
        |  count(*) FILTER (WHERE event_type = 'view') AS n_view
        |FROM ev GROUP BY 1 ORDER BY 1""".stripMargin))
}
