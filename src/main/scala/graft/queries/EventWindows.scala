package graft.queries

import org.apache.spark.sql.functions._

/** SURVEY.md §2.6 Q23–Q25: time-window aggregations over `events`, run as
  * batch here (their Structured Streaming twins with watermarks live in
  * [[graft.streaming.EventStreams]] — same groupBy expressions, so batch
  * correctness transfers).
  */
object EventWindows {
  import Canon.moneySum

  def defs: Seq[QueryDef] = Seq(q23, q24, q25, x76_funnel, x77_retention)

  /** Ordered conversion funnel view → click → purchase: each stage's first
    * event at-or-after the previous stage's, per user. Three keyed
    * aggregations + two left joins — no window over the whole event
    * history, so the plan scales with users, not events-per-user².
    */
  val x76_funnel: QueryDef = QueryDef(
    "x76_funnel",
    Sql.canon(
      s"""WITH v AS (SELECT user_id, MIN(ts) AS t_view FROM events
         |           WHERE event_type = 'view' GROUP BY user_id),
         |c AS (SELECT e.user_id, MIN(e.ts) AS t_click
         |      FROM events e JOIN v ON e.user_id = v.user_id AND e.ts >= v.t_view
         |      WHERE e.event_type = 'click' GROUP BY e.user_id),
         |p AS (SELECT e.user_id, MIN(e.ts) AS t_buy
         |      FROM events e JOIN c ON e.user_id = c.user_id AND e.ts >= c.t_click
         |      WHERE e.event_type = 'purchase' GROUP BY e.user_id)
         |SELECT v.user_id, ${Sql.ts("v.t_view")} AS t_view,
         |  ${Sql.ts("c.t_click")} AS t_click, ${Sql.ts("p.t_buy")} AS t_buy
         |FROM v LEFT JOIN c ON v.user_id = c.user_id
         |       LEFT JOIN p ON c.user_id = p.user_id""".stripMargin,
      Seq("user_id", "t_view", "t_click", "t_buy"))) { (s, d) =>
    val ev = Tables.events(s, d)
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
    val c = ev.filter(col("event_type") === "click").as("e")
      .join(v.as("v"), col("e.user_id") === col("v.user_id") &&
        col("e.ts") >= col("v.t_view"))
      .groupBy(col("e.user_id").as("user_id"))
      .agg(min(col("e.ts")).as("t_click"))
    val p = ev.filter(col("event_type") === "purchase").as("e")
      .join(c.as("c"), col("e.user_id") === col("c.user_id") &&
        col("e.ts") >= col("c.t_click"))
      .groupBy(col("e.user_id").as("user_id"))
      .agg(min(col("e.ts")).as("t_buy"))
    Canon(v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
      .select(col("user_id"), col("t_view"), col("t_click"), col("t_buy")))
  }

  /** Daily retention: users active N days after their first-seen day.
    * Cohorting is two keyed aggregations — the classic product-analytics
    * query, shuffling only (user, day) pairs.
    */
  val x77_retention: QueryDef = QueryDef(
    "x77_retention",
    Sql.canon(
      """WITH f AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS d0
        |           FROM events GROUP BY user_id),
        |a AS (SELECT DISTINCT e.user_id, CAST(e.ts AS DATE) AS d FROM events e)
        |SELECT CAST(DATEDIFF('day', f.d0, a.d) AS INT) AS day_offset,
        |  COUNT(*) AS n_active
        |FROM a JOIN f ON a.user_id = f.user_id GROUP BY 1""".stripMargin,
      Seq("day_offset", "n_active"))) { (s, d) =>
    val ev = Tables.events(s, d)
    val f = ev.groupBy(col("user_id")).agg(min(to_date(col("ts"))).as("d0"))
    val a = ev.select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    Canon(a.join(f, "user_id")
      .groupBy(datediff(col("d"), col("d0")).as("day_offset"))
      .agg(count(lit(1)).as("n_active")))
  }

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
