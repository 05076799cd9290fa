package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery
import graft.SparkSpec
import graft.streaming.EventStreams.Ev

class EventStreamsSpec extends SparkSpec {

  private def ts(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2026-03-01 $hhmm:00")

  /** Drive a streaming DataFrame from a MemoryStream through a memory sink,
    * feeding `batches` one processAllAvailable() at a time (so the watermark
    * advances between batches), then return the sink contents.
    */
  private def drive(name: String,
                    pipeline: DataFrame => DataFrame,
                    batches: Seq[Seq[Ev]]): Seq[org.apache.spark.sql.Row] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Ev]
    val q: StreamingQuery = pipeline(mem.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name).collect().toSeq
  }

  test("tumbling windows emit once the watermark passes; late-beyond-watermark dropped") {
    val rows = drive("tumbling", EventStreams.tumblingCounts(_, "30 minutes"), Seq(
      // hour-1 events (out of order within the hour)
      Seq(Ev(ts("10:20"), 1, "click", 1.0), Ev(ts("10:05"), 2, "click", 2.0)),
      // advance event time far enough that watermark (11:40-0:30=11:10)
      // passes the 10:00-11:00 window end
      Seq(Ev(ts("11:40"), 1, "click", 4.0)),
      // this event is BEHIND the watermark -> must be dropped
      Seq(Ev(ts("10:30"), 3, "click", 99.0)),
      // push watermark past 12:00 so the 11:00 window also closes
      Seq(Ev(ts("12:45"), 1, "view", 8.0)),
      Seq(Ev(ts("13:45"), 1, "view", 0.0))))
    val byWindow = rows.map(r => (r.getTimestamp(0).toString, r.getString(1)) ->
      (r.getLong(2), r.getDouble(3))).toMap
    // 10:00 window: both in-order events, NOT the late 10:30 one
    assert(byWindow(("2026-03-01 10:00:00.0", "click")) == (2L, 3.0),
      s"late event leaked into closed window: $byWindow")
    assert(byWindow.contains(("2026-03-01 11:00:00.0", "click")))
  }

  test("sliding windows assign events to every overlapping window") {
    val rows = drive("sliding", EventStreams.slidingCounts(_, "30 minutes"), Seq(
      Seq(Ev(ts("10:20"), 1, "click", 1.0)),
      Seq(Ev(ts("12:30"), 1, "click", 1.0)),
      Seq(Ev(ts("14:00"), 1, "click", 1.0))))
    val clickWindows = rows.filter(_.getString(1) == "click")
      .map(_.getTimestamp(0).toString).toSet
    // a 10:20 event belongs to 4 hour-long windows starting 09:30..10:15
    assert(Set("2026-03-01 09:30:00.0", "2026-03-01 09:45:00.0",
      "2026-03-01 10:00:00.0", "2026-03-01 10:15:00.0").subsetOf(clickWindows),
      s"got $clickWindows")
  }

  test("session windows split on the 30-minute gap") {
    val rows = drive("sessions", EventStreams.sessionCounts(_), Seq(
      Seq(Ev(ts("10:00"), 1, "a", 1.0), Ev(ts("10:10"), 1, "a", 1.0),
        Ev(ts("10:50"), 1, "a", 1.0)), // 10:10->10:50 gap 40min -> new session
      Seq(Ev(ts("14:00"), 1, "a", 0.0)), // advance watermark, close sessions
      Seq(Ev(ts("16:00"), 1, "a", 0.0))))
    val sessions = rows.filter(_.getLong(2) == 1L)
      .map(r => (r.getTimestamp(0).toString, r.getLong(3))).sorted
    assert(sessions.contains(("2026-03-01 10:00:00.0", 2L)), s"got $sessions")
    assert(sessions.contains(("2026-03-01 10:50:00.0", 1L)), s"got $sessions")
  }

  test("custom sessionize (flatMapGroupsWithState) matches the gap semantics") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Ev]
    val q = EventStreams.sessionize(mem.toDS())
      .writeStream.format("memory").queryName("custom_sessions")
      .outputMode("append").start()
    try {
      mem.addData(Seq(Ev(ts("10:00"), 1, "a", 1.0), Ev(ts("10:10"), 1, "a", 2.0)))
      q.processAllAvailable()
      // gap > 30min within one user closes the first session
      mem.addData(Seq(Ev(ts("11:30"), 1, "a", 5.0)))
      q.processAllAvailable()
      mem.addData(Seq(Ev(ts("15:00"), 2, "b", 0.0))) // advance watermark
      q.processAllAvailable()
      mem.addData(Seq(Ev(ts("18:00"), 2, "b", 0.0)))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("custom_sessions").as[EventStreams.SessionOut].collect()
    val u1 = out.filter(_.user_id == 1).sortBy(_.start.getTime)
    assert(u1.exists(s => s.n_events == 2 && s.value_sum == 3.0),
      s"first session wrong: ${u1.toSeq}")
    assert(u1.exists(s => s.n_events == 1 && s.value_sum == 5.0),
      s"second session wrong: ${u1.toSeq}")
  }

  test("file-source ingest stream reads NDJSON events incrementally") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val q = EventStreams.ingestStream(spark, dir)
      .writeStream.format("memory").queryName("ingested")
      .outputMode("append").start()
    try {
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/b1.json"),
        """{"event_id":1,"ts":"2026-03-01T10:00:00Z","user_id":5,"event_type":"click","value":1.5,"props":"{}"}
          |{"event_id":2,"ts":"2026-03-01T10:01:00Z","user_id":6,"event_type":"view","value":2.5,"props":"{}"}""".stripMargin)
      q.processAllAvailable()
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/b2.json"),
        """{"event_id":3,"ts":"2026-03-01T10:02:00Z","user_id":7,"event_type":"click","value":3.5,"props":"{}"}""")
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("ingested").select("event_id").as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 2L, 3L))
  }

  test("stream-stream interval join pairs clicks with following views only") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Ev]
    // Ev has no event_id; build the join input from a synthetic frame
    val evDf = mem.toDF()
      .withColumn("event_id",
        org.apache.spark.sql.functions.expr("CAST(user_id * 1000 + unix_timestamp(ts) % 1000 AS LONG)"))
    val q = EventStreams.clickViewJoin(evDf)
      .writeStream.format("memory").queryName("ssjoin")
      .outputMode("append").start()
    try {
      mem.addData(Seq(
        Ev(ts("10:00"), 1, "click", 0),
        Ev(ts("10:05"), 1, "view", 0),  // within 10 min -> joins
        Ev(ts("10:20"), 1, "view", 0),  // 20 min later -> outside interval
        Ev(ts("10:04"), 2, "view", 0))) // other user -> no join
      q.processAllAvailable()
      // advance watermark so results finalize
      mem.addData(Seq(Ev(ts("12:00"), 9, "click", 0)))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("ssjoin").collect()
    assert(rows.length == 1, s"expected one click-view pair, got ${rows.toSeq}")
    assert(rows.head.getAs[Long]("user_id") == 1L)
  }

  test("left-outer interval join emits unmatched clicks after the watermark closes them") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Ev]
    val evDf = mem.toDF()
      .withColumn("event_id",
        org.apache.spark.sql.functions.expr("CAST(user_id * 1000 + unix_timestamp(ts) % 1000 AS LONG)"))
    val q = EventStreams.clickViewJoin(evDf, joinType = "left_outer")
      .writeStream.format("memory").queryName("lojoin")
      .outputMode("append").start()
    try {
      mem.addData(Seq(
        Ev(ts("10:00"), 1, "click", 0), // will match
        Ev(ts("10:05"), 1, "view", 0),
        Ev(ts("10:00"), 2, "click", 0))) // never matches
      q.processAllAvailable()
      // the global watermark is the MIN across both inputs — advance event
      // time on BOTH the click and the view side so user 2's state closes
      mem.addData(Seq(Ev(ts("13:00"), 9, "view", 0), Ev(ts("13:00"), 9, "click", 0)))
      q.processAllAvailable()
      mem.addData(Seq(Ev(ts("15:00"), 9, "view", 0), Ev(ts("15:00"), 9, "click", 0)))
      q.processAllAvailable()
    } finally q.stop()
    val byUser = spark.table("lojoin").collect()
      .groupBy(_.getAs[Long]("user_id"))
    assert(byUser(1L).exists(r => !r.isNullAt(r.fieldIndex("view_id"))))
    assert(byUser(2L).exists(r => r.isNullAt(r.fieldIndex("view_id"))),
      s"unmatched click not emitted with null view: ${spark.table("lojoin").collect().toSeq}")
  }

  test("stream-static enrichment attaches dimension attributes per batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("cust_id", "tier")
    val mem = MemoryStream[Ev]
    val q = EventStreams.enrich(mem.toDF(), dim, "user_id", "cust_id")
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      mem.addData(Seq(Ev(ts("10:00"), 1, "click", 1.0),
        Ev(ts("10:01"), 3, "view", 2.0)))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("enriched").collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[String]("tier")).toMap
    assert(rows(1L) == "gold")
    assert(rows(3L) == null) // left join keeps unmatched stream rows
  }

  test("ingest restart from checkpoint is exactly-once (no re-read, no loss)") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-eo")
    val (src, out, ckpt) = (s"$base/src", s"$base/out", s"$base/ckpt")
    new java.io.File(src).mkdirs()
    def startQuery() = EventStreams.ingestStream(spark, src)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    def addFile(name: String, ids: Seq[Long]): Unit =
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$src/$name"),
        ids.map(i => s"""{"event_id":$i,"ts":"2026-03-01T10:0$i:00Z","user_id":$i,"event_type":"click","value":1.0,"props":"{}"}""")
          .mkString("\n"))

    val q1 = startQuery()
    try { addFile("b1.json", Seq(1, 2)); q1.processAllAvailable() }
    finally q1.stop()
    // restart from the same checkpoint: b1 must NOT be re-ingested, b2 must be
    addFile("b2.json", Seq(3))
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.read.parquet(out).select("event_id").as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 2L, 3L),
      s"checkpoint recovery broke exactly-once: ${got.toSeq}")
  }

  test("streaming dedup drops within-watermark duplicates, re-admits after expiry") {
    val rows = drive("dedup",
      EventStreams.dedupStream(_, Seq("user_id", "event_type"), "30 minutes"), Seq(
        // duplicate key (1, click) within one batch -> one survivor
        Seq(Ev(ts("10:00"), 1, "click", 1.0), Ev(ts("10:05"), 1, "click", 2.0),
          Ev(ts("10:10"), 2, "view", 3.0)),
        // same key again while its state is live -> dropped
        Seq(Ev(ts("10:20"), 1, "click", 4.0)),
        // advance watermark far past 10:05 + 30min so (1, click) expires
        Seq(Ev(ts("12:00"), 3, "click", 5.0)),
        // expired key re-admitted (cross-horizon dedup is the batch layer's job)
        Seq(Ev(ts("12:10"), 1, "click", 6.0))))
    val perKey = rows.groupBy(r => (r.getLong(1), r.getString(2)))
      .view.mapValues(_.size).toMap
    assert(perKey((2L, "view")) == 1)
    assert(perKey((3L, "click")) == 1)
    assert(perKey((1L, "click")) == 2, // one per watermark horizon
      s"expected within-horizon dedup + post-expiry re-admit, got $rows")
  }
}
