package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming twins of the engine's event pipelines.
  *
  * The reference's only streaming surface is the bulk-ingest file runner
  * (`/root/reference/src/main/kotlin/io/marauder/tank/FileWaitGroup.kt:19-73`:
  * poll dir → `.lock` rename → ≤2 concurrent files). [[ingestStream]] is its
  * Spark-native equivalent (file source with `maxFilesPerTrigger`, exactly-
  * once bookkeeping via checkpoint instead of rename locks). The windowed
  * aggregations are the streaming forms of the Q23–Q25 batch queries, with
  * explicit watermark/late-data policy; [[sessionize]] shows arbitrary
  * stateful processing (flatMapGroupsWithState) for custom session logic
  * beyond `session_window`.
  *
  * Scale posture: every aggregation keys its state by (window, event_type)
  * or (user, session) — state size is bounded by the watermark horizon, not
  * by stream length; no per-event driver work.
  */
object EventStreams {

  /** File-source streaming ingest of events-shaped NDJSON (A3's twin). */
  def ingestStream(spark: SparkSession, dir: String,
                   maxFilesPerTrigger: Int = 2): DataFrame =
    spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, props STRING")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(dir)

  /** Per-type counts + value sums in 1-hour tumbling windows (Q23 twin).
    * Events later than the watermark horizon are dropped; in Append mode a
    * window emits once, when the watermark passes its end.
    */
  def tumblingCounts(events: DataFrame, watermark: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("value_sum"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("value_sum"))

  /** 1-hour windows sliding every 15 minutes (Q24 twin). */
  def slidingCounts(events: DataFrame, watermark: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"))

  /** Per-user session windows with a 30-minute gap (Q25 twin). */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
                    watermark: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("value_sum"))
      .select(col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"),
        col("user_id"), col("n_events"), col("value_sum"))

  /** Stream-stream interval join: each click joined to the same user's
    * views within the following `interval`. Both sides carry watermarks and
    * the join condition bounds event-time distance, so each side's buffered
    * state is evicted once the watermark passes its join horizon — the only
    * state-bounded shape for joining two unbounded streams.
    *
    * With `joinType = "left_outer"`, a click with no view in its interval
    * is still emitted (null view columns) — but only once the watermark
    * proves no matching view can arrive, which is exactly the semantics a
    * "clicks that never converted" stream needs.
    */
  def clickViewJoin(events: DataFrame, watermark: String = "30 minutes",
                    interval: String = "10 minutes",
                    joinType: String = "inner"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", watermark)
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("view_id"))
      .withWatermark("v_ts", watermark)
    clicks.join(views,
      col("c_user") === col("v_user") &&
        col("v_ts") >= col("c_ts") &&
        col("v_ts") <= col("c_ts") + expr(s"INTERVAL $interval"),
      joinType)
      .select(col("c_user").as("user_id"), col("click_id"), col("view_id"),
        col("c_ts"), col("v_ts"))
  }

  /** Stream-static enrichment: a dimension DataFrame (bounded, e.g. the
    * customer table) joined onto the stream. The static side is re-read per
    * micro-batch by Spark; broadcast keeps the join shuffle-free on the
    * stream side — the standard dimension-enrichment shape.
    */
  def enrich(events: DataFrame, dim: DataFrame,
             eventKey: String, dimKey: String): DataFrame =
    // dataframe-qualified refs: bare col() is ambiguous when both sides
    // share the key column name (the usual same-named dimension key)
    events.join(broadcast(dim), events(eventKey) === dim(dimKey), "left")

  /** Streaming exact dedup (q31's streaming twin): drop rows whose key was
    * already seen within the watermark horizon. State is bounded by event
    * time via `dropDuplicatesWithinWatermark` — the only viable dedup shape
    * on an unbounded stream (an unwindowed `dropDuplicates` would grow its
    * state forever). A duplicate arriving after its key's state has expired
    * is re-emitted: cross-horizon dedup belongs to the batch layer (q31).
    */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
                  watermark: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  // ------------------------------------------------ custom session state

  final case class Ev(ts: java.sql.Timestamp, user_id: Long,
                      event_type: String, value: Double)
  final case class SessionState(start: Long, last: Long, n: Int, sum: Double)
  final case class SessionOut(user_id: Long, start: java.sql.Timestamp,
                              end: java.sql.Timestamp, n_events: Int,
                              value_sum: Double)

  /** Custom sessionization via flatMapGroupsWithState: emits a session when
    * the gap elapses (event-time timeout), carrying arbitrary per-session
    * aggregates — the escape hatch `session_window` can't express (e.g.
    * value-dependent gaps or mid-session triggers).
    *
    * Semantics note (eager split): a within-batch gap closes the earlier
    * session IMMEDIATELY rather than waiting for the watermark, so a late
    * event that would bridge two sessions after an in-batch split yields
    * two emitted sessions where `session_window` would merge to one.
    * Exact watermark-deferred merging needs the full session list held in
    * state until the horizon passes — use the built-in [[sessionCounts]]
    * when bridge-exactness matters; this operator trades it for O(1) state
    * per (user, open session).
    */
  def sessionize(events: Dataset[Ev], gapMs: Long = 30 * 60 * 1000L): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "30 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          if (evs.isEmpty && state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(user, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.last), s.n, s.sum))
          } else {
            val sorted = evs.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val closed = scala.collection.mutable.ArrayBuffer[SessionOut]()
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  // a late-but-admitted event can precede the open session:
                  // extend BOTH ends, or the emitted [start, end] disagrees
                  // with the n/sum it claims to cover
                  cur = Some(s.copy(start = math.min(s.start, t),
                    last = math.max(s.last, t), n = s.n + 1,
                    sum = s.sum + e.value))
                case Some(s) =>
                  closed += SessionOut(user, new java.sql.Timestamp(s.start),
                    new java.sql.Timestamp(s.last), s.n, s.sum)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.iterator
          }
      }
  }
}
