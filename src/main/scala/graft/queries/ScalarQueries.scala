package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalar-function and set-operation coverage: strings, date parts, JSON
  * extraction, set ops, percentiles, math — each aligned expression-by-
  * expression with its DuckDB equivalent. Fractional results are emitted
  * as scale-0-rounded scaled BIGINTs (never double/decimal): a scale-0
  * `round` of an identically-computed IEEE double agrees bit-for-bit
  * across engines, while `round(x, n)` for n>0 and double→decimal casts
  * do not.
  */
object ScalarQueries {

  private def ev(s: SparkSession, dir: String): DataFrame =
    ArchiveQueries.ev(s, dir)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q_string_funcs" -> ((s, dir) => {
      import s.implicits._
      ev(s, dir).select(
        $"event_id",
        upper($"event_type").as("upper_type"),
        lpad($"user_id".cast("string"), 4, "0").as("padded_user"),
        translate($"event_type", "aeiou", "AEIOU").as("translated"),
        reverse($"event_type").as("reversed"),
        substring($"event_type", 2, 3).as("middle"),
        instr($"event_type", "e").as("first_e"),
        length(concat_ws("-", $"event_type", $"user_id")).as("key_len"),
        levenshtein($"event_type", lit("click")).as("edit_dist"))
        .orderBy($"event_id")
    }),

    "q_date_parts" -> ((s, dir) => {
      import s.implicits._
      ev(s, dir)
        .withColumn("t", timestamp_millis($"start_ms"))
        .select($"event_id",
          year($"t").as("y"), month($"t").as("m"),
          dayofmonth($"t").as("d"), hour($"t").as("h"),
          minute($"t").as("mi"),
          (weekday($"t") + 1).as("iso_dow"),
          date_format($"t", "yyyy-MM-dd").as("day_str"))
        .orderBy($"event_id")
    }),

    "q_json_extract" -> ((s, dir) => {
      import s.implicits._
      ev(s, dir).select(
        $"event_id",
        get_json_object($"props", "$.k").as("k_str"),
        get_json_object($"props", "$.k").cast("long").as("k_num"),
        get_json_object($"props", "$.missing").as("absent"))
        .orderBy($"event_id")
    }),

    "q_set_ops" -> ((s, dir) => {
      import s.implicits._
      val base = ev(s, dir)
      def users(t: String) =
        base.filter($"event_type" === t).select($"user_id").distinct()
      val both = users("click").intersect(users("purchase"))
        .withColumn("relation", lit("click_and_purchase"))
      val clickOnly = users("click").except(users("purchase"))
        .withColumn("relation", lit("click_only"))
      both.unionByName(clickOnly)
        .select($"relation", $"user_id")
        .orderBy($"relation", $"user_id")
    }),

    // exact discrete percentiles (value at 1-indexed rank ceil(p*n) of the
    // sorted multiset) in pure integer arithmetic, via bucket-and-refine
    // selection (operators.Quantiles) — the row_number()-over-3-partitions
    // spelling sorts each group in one task, which caps parallelism at
    // the group count no matter the cluster size
    "q_percentiles" -> ((s, dir) => {
      import s.implicits._
      // PINNED (r17): five legs consume this frame (two exactKth
      // histogram chains, their refine joins, and the totals aggregate)
      // and each unpinned leg re-ran the parquet scan + the two
      // decimal-round casts; the pin is three numeric columns per row —
      // cheaper to write once than to recompute per leg. Values and
      // oracle unchanged.
      val li = graft.operators.Checkpoints.pin(
        Tables.readPlain(s, dir, "lineitem").select(
          $"l_returnflag",
          expr("CAST(round(l_quantity * 100) AS BIGINT)").as("qty_c"),
          expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("price_c")))
      val medQty = graft.operators.Quantiles.exactKth(
        li, "l_returnflag", "qty_c",
        Seq("median" -> expr("(__n + 1) div 2")))
        .groupBy($"l_returnflag")
        .agg(max($"value").as("median_qty_c"))
      val p90Price = graft.operators.Quantiles.exactKth(
        li, "l_returnflag", "price_c",
        Seq("p90" -> expr("(9 * __n + 9) div 10")))
        .groupBy($"l_returnflag")
        .agg(max($"value").as("p90_price_c"))
      val totals = li.groupBy($"l_returnflag").agg(count(lit(1)).as("n"))
      medQty.join(p90Price, Seq("l_returnflag"))
        .join(totals, Seq("l_returnflag"))
        .select($"l_returnflag", $"median_qty_c", $"p90_price_c", $"n")
        .orderBy($"l_returnflag")
    }),

    "q_math_funcs" -> ((s, dir) => {
      import s.implicits._
      ev(s, dir).select(
        $"event_id",
        // sqrt is IEEE-correctly-rounded, so bits match across engines;
        // value*value (not power) keeps the square a plain IEEE multiply
        expr("CAST(round(sqrt(value) * 1000000) AS BIGINT)").as("sqrt_v_micro"),
        expr("CAST(round(ln(value + 1) * 1000000) AS BIGINT)").as("ln_v_micro"),
        expr("CAST(round(value * value * 10000) AS BIGINT)").as("sq_v_4"),
        expr("CAST(ceil(value) AS BIGINT)").as("ceil_v"),
        expr("CAST(floor(value) AS BIGINT)").as("floor_v"),
        abs($"user_id" - 75).as("abs_centered"),
        pmod($"event_id", lit(7)).as("mod7"))
        .orderBy($"event_id")
    }))

  val oracleSql: Map[String, String] = Map(
    "q_string_funcs" -> (ArchiveQueries.EvCte +
      """SELECT event_id,
        |  upper(event_type) AS upper_type,
        |  lpad(CAST(user_id AS VARCHAR), 4, '0') AS padded_user,
        |  translate(event_type, 'aeiou', 'AEIOU') AS translated,
        |  reverse(event_type) AS reversed,
        |  substring(event_type, 2, 3) AS middle,
        |  instr(event_type, 'e') AS first_e,
        |  length(event_type || '-' || user_id) AS key_len,
        |  levenshtein(event_type, 'click') AS edit_dist
        |FROM ev ORDER BY event_id""".stripMargin),

    "q_date_parts" -> (ArchiveQueries.EvCte +
      """SELECT event_id,
        |  CAST(extract(year FROM t) AS INT) AS y,
        |  CAST(extract(month FROM t) AS INT) AS m,
        |  CAST(extract(day FROM t) AS INT) AS d,
        |  CAST(extract(hour FROM t) AS INT) AS h,
        |  CAST(extract(minute FROM t) AS INT) AS mi,
        |  CAST(isodow(t) AS INT) AS iso_dow,
        |  strftime(t, '%Y-%m-%d') AS day_str
        |FROM (SELECT event_id, make_timestamp(start_ms * 1000) AS t FROM ev)
        |ORDER BY event_id""".stripMargin),

    "q_json_extract" -> (ArchiveQueries.EvCte +
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
        |  json_extract_string(props, '$.missing') AS absent
        |FROM ev ORDER BY event_id""".stripMargin),

    "q_set_ops" -> (ArchiveQueries.EvCte +
      """SELECT 'click_and_purchase' AS relation, user_id FROM (
        |  SELECT DISTINCT user_id FROM ev WHERE event_type = 'click'
        |  INTERSECT
        |  SELECT DISTINCT user_id FROM ev WHERE event_type = 'purchase')
        |UNION ALL
        |SELECT 'click_only' AS relation, user_id FROM (
        |  SELECT DISTINCT user_id FROM ev WHERE event_type = 'click'
        |  EXCEPT
        |  SELECT DISTINCT user_id FROM ev WHERE event_type = 'purchase')
        |ORDER BY relation, user_id""".stripMargin),

    "q_percentiles" ->
      """WITH li AS (
        |  SELECT l_returnflag,
        |         CAST(round(l_quantity * 100) AS BIGINT) AS qty_c,
        |         CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c
        |  FROM lineitem),
        |r AS (
        |  SELECT l_returnflag, qty_c, price_c,
        |    count(*) OVER (PARTITION BY l_returnflag) AS n_grp,
        |    row_number() OVER (PARTITION BY l_returnflag ORDER BY qty_c) AS rq,
        |    row_number() OVER (PARTITION BY l_returnflag ORDER BY price_c) AS rp
        |  FROM li)
        |SELECT l_returnflag,
        |  CAST(max(CASE WHEN rq = (n_grp + 1) // 2 THEN qty_c END) AS BIGINT)
        |    AS median_qty_c,
        |  CAST(max(CASE WHEN rp = (9 * n_grp + 9) // 10 THEN price_c END) AS BIGINT)
        |    AS p90_price_c,
        |  count(*) AS n
        |FROM r GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_math_funcs" -> (ArchiveQueries.EvCte +
      """SELECT event_id,
        |  CAST(round(sqrt(value) * 1000000) AS BIGINT) AS sqrt_v_micro,
        |  CAST(round(ln(value + 1) * 1000000) AS BIGINT) AS ln_v_micro,
        |  CAST(round(value * value * 10000) AS BIGINT) AS sq_v_4,
        |  CAST(ceil(value) AS BIGINT) AS ceil_v,
        |  CAST(floor(value) AS BIGINT) AS floor_v,
        |  abs(user_id - 75) AS abs_centered,
        |  event_id % 7 AS mod7
        |FROM ev ORDER BY event_id""".stripMargin))
}
