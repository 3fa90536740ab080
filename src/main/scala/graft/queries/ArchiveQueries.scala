package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's archive/query semantics (SURVEY §2.1–2.6) expressed as
  * oracle-checkable queries over the synthetic `events` table, which stands
  * in for the record table: `what` = event_type, `where` = user shard,
  * `start` = epoch-ms of ts, `end` = start + floor(value·3600000) with every
  * third event an instant (null end) — same shape as datalake metadata.
  *
  * Every query is a declarative single plan: filters and projections push
  * to the parquet scan, aggregations are partial-agg friendly, top-1-per-key
  * uses window row_number (shuffle once on the partition key), and page
  * queries compile to TakeOrderedAndProject (no full sort at scale).
  */
object ArchiveQueries {

  private val DayMs = 86400000L
  // query interval: 2024-01-10T00:00Z .. 2024-01-12T00:00Z
  private val Qs = 1704844800000L
  private val Qe = 1705017600000L

  /** Shared base projection: ms interval columns derived from events.
    * The events table has shipped with two physical `ts` encodings across
    * testdata generations: ns-precision (Spark 4 reads as Long ns since
    * epoch under `nanosAsLong`) and us-precision (read as TIMESTAMP_NTZ).
    * Derive start_ms from whichever arrives — both truncate to the same
    * integer ms as DuckDB's epoch_ms(ts), so the oracle CTE is unchanged.
    * (The NTZ→TIMESTAMP cast is exact because the session timezone is
    * pinned to UTC in Verify/Bench/tests.)
    */
  // one analyzed plan per (session, dir) — the Tables.frameCache
  // discipline (r18): a lazy frame over the immutable test table, so
  // every action still scans parquet; only the per-call re-listing,
  // footer read, and analysis are saved (they rode every timed archive
  // query — OverheadProbe measured ~0.1 s/query of construct)
  private val evCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), DataFrame]

  def ev(spark: SparkSession, dir: String): DataFrame =
    evCache.getOrElseUpdate((spark, dir), {
      import spark.implicits._
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/events.parquet")
      val startMs = raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => expr("ts div 1000000")
        case _ => expr("unix_micros(cast(ts as timestamp)) div 1000")
      }
      raw
        .select($"event_id", $"user_id", $"event_type", $"value", $"props",
          startMs.as("start_ms"))
        .withColumn("end_ms",
          when($"event_id" % 3 === 0, lit(null).cast("long"))
            .otherwise($"start_ms" + floor($"value" * 3600000).cast("long")))
    })

  /** Shared DuckDB CTE matching `ev` — referenced by every events-based
    * oracle so the two derivations can never drift apart. */
  private[queries] val EvCte =
    """WITH ev AS (
      |  SELECT event_id, user_id, event_type, value, props,
      |         epoch_ms(ts) AS start_ms,
      |         CASE WHEN event_id % 3 = 0 THEN NULL
      |              ELSE epoch_ms(ts) + CAST(floor(value * 3600000) AS BIGINT)
      |         END AS end_ms
      |  FROM events)
      |""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // F1/F2 — interval-intersection filter with null-end ⇒ point semantics
    // (querier.py:286-303)
    "q_time_interval" -> ((s, dir) => {
      import s.implicits._
      ev(s, dir)
        .filter(coalesce($"end_ms", $"start_ms") >= Qs && $"start_ms" <= Qe)
        .select($"event_id", $"start_ms", $"end_ms")
        .orderBy($"event_id")
    }),

    // J1/C3 — explode day buckets spanned by each interval (record.py:184-192)
    "q_bucket_explode" -> ((s, dir) => {
      import s.implicits._
      // guard the degenerate end < start: Spark's sequence(a, b) steps
      // DOWN when b < a while the oracle's generate_series returns
      // empty — such a row must contribute no buckets in both engines
      // (the reference validates it away upstream; metadata.py:166-173)
      ev(s, dir)
        .withColumn("__a", expr("start_ms div 86400000"))
        .withColumn("__b", expr("coalesce(end_ms, start_ms) div 86400000"))
        .withColumn("time_bucket",
          explode(expr("CASE WHEN __b >= __a THEN sequence(__a, __b) " +
            "ELSE CAST(array() AS ARRAY<BIGINT>) END")))
        .groupBy($"time_bucket")
        .agg(count(lit(1)).as("n_records"),
          countDistinct($"event_id").as("n_files"))
        .orderBy($"time_bucket")
    }),

    // A1 — order-preserving dedup: first row per key (querier.py:153-163)
    "q_dedup_first" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"start_ms", $"event_id")
      ev(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"user_id", $"event_id".as("first_event_id"),
          $"start_ms".as("first_start_ms"))
        .orderBy($"user_id")
    }),

    // A2/W1 — latest = argmax by (start, tie-break) (querier.py:384-395)
    "q_latest_tiebreak" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"event_type")
        .orderBy($"start_ms".desc, $"event_id".desc)
      ev(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"event_type", $"event_id".as("latest_event_id"),
          $"start_ms".as("latest_start_ms"))
        .orderBy($"event_type")
    }),

    // W2 — page limit with deterministic total order (querier.py:28-33)
    "q_page_limit" -> ((s, dir) => {
      import s.implicits._
      ev(s, dir)
        .select($"event_id", $"start_ms")
        .orderBy($"start_ms", $"event_id")
        .limit(100)
    }),

    // W3 — key-based cursor resume, never offset (querier.py:321-341)
    "q_cursor_page" -> ((s, dir) => {
      import s.implicits._
      ev(s, dir)
        .filter($"start_ms" > Qs || ($"start_ms" === Qs && $"event_id" > 5000))
        .select($"event_id", $"start_ms")
        .orderBy($"start_ms", $"event_id")
        .limit(100)
    }),

    // S2 — work-id index lookup: equality on (work_id, what)
    // (querier.py:192-215)
    "q_workid_equality" -> ((s, dir) => {
      import s.implicits._
      ev(s, dir)
        .filter($"event_type" === "purchase" && $"user_id" === 42)
        .select($"event_id", $"start_ms")
        .orderBy($"event_id")
    }),

    // F3 — begins_with(range_key, where:) ≡ equality on where
    // (querier.py:217-221)
    "q_where_prefix" -> ((s, dir) => {
      import s.implicits._
      ev(s, dir)
        .withColumn("range_key",
          concat_ws(":", $"event_type", $"event_id"))
        .filter($"range_key".startsWith("click:"))
        .select($"event_id", $"range_key")
        .orderBy($"event_id")
    }),

    // C4/C11 — composite index key derivations (record.py:58,194-199)
    "q_key_concat" -> ((s, dir) => {
      import s.implicits._
      ev(s, dir)
        .select($"event_id",
          concat_ws(":", expr("start_ms div 86400000"), $"event_type")
            .as("time_index_key"),
          concat_ws(":", $"event_type", $"user_id").as("range_key"),
          concat_ws(":", $"event_type",
            concat(lit("u"), $"user_id")).as("what_where_key"))
        .orderBy($"event_id")
    }),

    // C1 — normalize_date s/ms heuristic at 1e11 (metadata.py:26-28,180-213)
    "q_normalize_ms" -> ((s, dir) => {
      import s.implicits._
      ev(s, dir)
        .withColumn("raw",
          when($"event_id" % 2 === 0, $"start_ms")
            .otherwise(floor($"start_ms" / 1000).cast("long")))
        .withColumn("normalized_ms",
          when($"raw" > 100000000000L, $"raw").otherwise($"raw" * 1000))
        .select($"event_id", $"raw", $"normalized_ms")
        .orderBy($"event_id")
    }),

    // C2 — ms → ISO-8601 UTC decoration (v0.py:35-63)
    "q_iso8601" -> ((s, dir) => {
      import s.implicits._
      ev(s, dir)
        .select($"event_id",
          date_format(timestamp_millis($"start_ms"),
            "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").as("start_iso"))
        .orderBy($"event_id")
    }),

    // F9/C5 — slug validation predicate (metadata.py:124-140)
    "q_validation_slug" -> ((s, dir) => {
      import s.implicits._
      ev(s, dir)
        .withColumn("candidate",
          when($"event_id" % 5 === 0, upper($"event_type"))
            .when($"event_id" % 7 === 0, concat($"event_type", lit(" x")))
            .otherwise(concat_ws("_", $"event_type", $"user_id")))
        .select($"event_id", $"candidate",
          $"candidate".rlike("^[a-z0-9_-]+$").cast("int").as("is_valid"))
        .orderBy($"event_id")
    }),

    // W4 — latest walk-back: newest non-empty bucket wins within lookback
    // window, argmax inside it (querier.py:384-417)
    "q_latest_walkback" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"event_type")
        .orderBy($"time_bucket".desc, $"start_ms".desc, $"event_id".desc)
      ev(s, dir)
        .withColumn("time_bucket", expr("start_ms div 86400000"))
        .filter($"time_bucket".between(19739L, 19753L))
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"event_type", $"time_bucket", $"event_id", $"start_ms")
        .orderBy($"event_type")
    }),

    // T1-shaped batch equivalent of the streaming ingest aggregation:
    // per-hour tumbling counts (what a foreachBatch over this stream sees)
    "q_hourly_agg" -> ((s, dir) => {
      import s.implicits._
      ev(s, dir)
        .withColumn("hour_bucket", expr("start_ms div 3600000"))
        .groupBy($"hour_bucket", $"event_type")
        .agg(count(lit(1)).as("n"),
          // per-row micro-scaled BIGINT before the sum: integer aggregation
          // is exact and byte-stable across engines
          sum(expr("CAST(round(value * 1000000) AS BIGINT)"))
            .as("sum_value_micro"))
        .orderBy($"hour_bucket", $"event_type")
    }),

    // S10/F7 — ingester-report style per-what stats (ingester.py:27-65)
    "q_report_stats" -> ((s, dir) => {
      import s.implicits._
      ev(s, dir)
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_records"),
          min($"start_ms").as("min_start_ms"),
          max($"start_ms").as("max_start_ms"),
          countDistinct($"user_id").as("n_wheres"))
        .orderBy($"event_type")
    }))

  val oracleSql: Map[String, String] = Map(
    "q_time_interval" -> (EvCte +
      s"""SELECT event_id, start_ms, end_ms FROM ev
         |WHERE coalesce(end_ms, start_ms) >= $Qs AND start_ms <= $Qe
         |ORDER BY event_id""".stripMargin),

    "q_bucket_explode" -> (EvCte +
      """, exploded AS (
        |  SELECT event_id,
        |         unnest(generate_series(start_ms // 86400000,
        |                coalesce(end_ms, start_ms) // 86400000)) AS time_bucket
        |  FROM ev)
        |SELECT time_bucket, count(*) AS n_records,
        |       count(DISTINCT event_id) AS n_files
        |FROM exploded GROUP BY time_bucket ORDER BY time_bucket""".stripMargin),

    "q_dedup_first" -> (EvCte +
      """SELECT user_id, event_id AS first_event_id, start_ms AS first_start_ms
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |        ORDER BY start_ms, event_id) AS rn FROM ev)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin),

    "q_latest_tiebreak" -> (EvCte +
      """SELECT event_type, event_id AS latest_event_id,
        |       start_ms AS latest_start_ms
        |FROM (SELECT *, row_number() OVER (PARTITION BY event_type
        |        ORDER BY start_ms DESC, event_id DESC) AS rn FROM ev)
        |WHERE rn = 1 ORDER BY event_type""".stripMargin),

    "q_page_limit" -> (EvCte +
      "SELECT event_id, start_ms FROM ev ORDER BY start_ms, event_id LIMIT 100"),

    "q_cursor_page" -> (EvCte +
      s"""SELECT event_id, start_ms FROM ev
         |WHERE start_ms > $Qs OR (start_ms = $Qs AND event_id > 5000)
         |ORDER BY start_ms, event_id LIMIT 100""".stripMargin),

    "q_workid_equality" -> (EvCte +
      """SELECT event_id, start_ms FROM ev
        |WHERE event_type = 'purchase' AND user_id = 42
        |ORDER BY event_id""".stripMargin),

    "q_where_prefix" -> (EvCte +
      """SELECT event_id, event_type || ':' || event_id AS range_key FROM ev
        |WHERE event_type || ':' || event_id LIKE 'click:%'
        |ORDER BY event_id""".stripMargin),

    "q_key_concat" -> (EvCte +
      """SELECT event_id,
        |       (start_ms // 86400000) || ':' || event_type AS time_index_key,
        |       event_type || ':' || user_id AS range_key,
        |       event_type || ':' || 'u' || user_id AS what_where_key
        |FROM ev ORDER BY event_id""".stripMargin),

    "q_normalize_ms" -> (EvCte +
      """SELECT event_id, raw,
        |       CASE WHEN raw > 100000000000 THEN raw ELSE raw * 1000 END
        |         AS normalized_ms
        |FROM (SELECT event_id,
        |        CASE WHEN event_id % 2 = 0 THEN start_ms
        |             ELSE CAST(floor(start_ms / 1000) AS BIGINT) END AS raw
        |      FROM ev)
        |ORDER BY event_id""".stripMargin),

    "q_iso8601" -> (EvCte +
      """SELECT event_id,
        |       strftime(make_timestamp(start_ms * 1000),
        |                '%Y-%m-%dT%H:%M:%S.%g') || 'Z' AS start_iso
        |FROM ev ORDER BY event_id""".stripMargin),

    "q_validation_slug" -> (EvCte +
      """SELECT event_id, candidate,
        |       CAST(regexp_matches(candidate, '^[a-z0-9_-]+$') AS INT)
        |         AS is_valid
        |FROM (SELECT event_id,
        |        CASE WHEN event_id % 5 = 0 THEN upper(event_type)
        |             WHEN event_id % 7 = 0 THEN event_type || ' x'
        |             ELSE event_type || '_' || user_id END AS candidate
        |      FROM ev)
        |ORDER BY event_id""".stripMargin),

    "q_latest_walkback" -> (EvCte +
      """SELECT event_type, time_bucket, event_id, start_ms
        |FROM (SELECT *, row_number() OVER (PARTITION BY event_type
        |        ORDER BY time_bucket DESC, start_ms DESC, event_id DESC) AS rn
        |      FROM (SELECT *, start_ms // 86400000 AS time_bucket FROM ev)
        |      WHERE time_bucket BETWEEN 19739 AND 19753)
        |WHERE rn = 1 ORDER BY event_type""".stripMargin),

    "q_hourly_agg" -> (EvCte +
      """SELECT start_ms // 3600000 AS hour_bucket, event_type,
        |       count(*) AS n,
        |       CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT)
        |         AS sum_value_micro
        |FROM ev GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    "q_report_stats" -> (EvCte +
      """SELECT event_type, count(*) AS n_records,
        |       min(start_ms) AS min_start_ms, max(start_ms) AS max_start_ms,
        |       count(DISTINCT user_id) AS n_wheres
        |FROM ev GROUP BY event_type ORDER BY event_type""".stripMargin))
}
