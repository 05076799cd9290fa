package graft.queries

import org.apache.spark.sql.functions._

/** SURVEY.md §2.6 Q23–Q25: time-window aggregations over `events`, run as
  * batch here (their Structured Streaming twins with watermarks live in
  * [[graft.streaming.StreamOps]] — same groupBy expressions, so batch
  * correctness transfers).
  */
object EventWindows {
  import Canon.moneySum

  def defs: Seq[QueryDef] = Seq(q23, q24, q25)

  /** Tumbling 1-hour windows per event_type. */
  val q23: QueryDef = QueryDef(
    "q23_tumbling",
    Sql.canon(
      s"""SELECT ${Sql.ts("date_trunc('hour', ts)")} AS window_start, event_type,
         |  COUNT(*) AS n, ${Sql.moneySum("value")} AS sum_value
         |FROM events GROUP BY date_trunc('hour', ts), event_type""".stripMargin,
      Seq("window_start", "event_type", "n", "sum_value"))) { (s, d) =>
    Canon(Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), moneySum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value")))
  }

  /** Sliding 1-hour windows every 15 minutes: each event lands in exactly 4
    * windows; the oracle enumerates the same 4 starts arithmetically.
    */
  val q24: QueryDef = QueryDef(
    "q24_sliding",
    Sql.canon(
      s"""SELECT ${Sql.ts("ws")} AS window_start, event_type,
         |  COUNT(*) AS n, ${Sql.moneySum("value")} AS sum_value
         |FROM (
         |  SELECT make_timestamp(((epoch_us(ts) // 900000000) - t.k) * 900000000) AS ws,
         |         event_type, value
         |  FROM events, (SELECT UNNEST([0,1,2,3]) AS k) t
         |) GROUP BY ws, event_type""".stripMargin,
      Seq("window_start", "event_type", "n", "sum_value"))) { (s, d) =>
    Canon(Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), moneySum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value")))
  }

  /** Session windows per user, 30-minute gap. Spark's session semantics:
    * an event at exactly prevEnd starts a NEW session (merge iff t < end),
    * session end = last event + gap; the oracle's gaps-and-islands SQL uses
    * `>=` on the gap accordingly.
    */
  val q25: QueryDef = QueryDef(
    "q25_session",
    Sql.canon(
      s"""SELECT user_id, ${Sql.ts("session_start")} AS session_start,
         |  ${Sql.ts("session_end")} AS session_end,
         |  n_events, ${"sum_value"}
         |FROM (
         |  SELECT user_id, MIN(ts) AS session_start,
         |    MAX(ts) + INTERVAL 30 MINUTE AS session_end,
         |    COUNT(*) AS n_events, ${Sql.moneySum("value")} AS sum_value
         |  FROM (
         |    SELECT user_id, ts, value,
         |      SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         |    FROM (
         |      SELECT user_id, ts, value, event_id,
         |        CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         |                  >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS is_new
         |      FROM events))
         |  GROUP BY user_id, sid
         |)""".stripMargin,
      Seq("user_id", "session_start", "session_end", "n_events", "sum_value"))) { (s, d) =>
    Canon(Tables.events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), moneySum(col("value")).as("sum_value"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"), col("sum_value")))
  }
}
