package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

class CurationStreamsSpec extends SparkSpec {

  final case class Doc(doc_id: Long, ts: Timestamp, text: String,
                       lang: String, source: String)

  private def ts(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2026-03-01 $hhmm:00")

  private def drive(batches: Seq[Seq[Doc]]): Seq[org.apache.spark.sql.Row] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Doc]
    val q = CurationStreams.curate(mem.toDF())
      .writeStream.format("memory").queryName("curated")
      .outputMode("append").start()
    try batches.foreach { b => mem.addData(b); q.processAllAvailable() }
    finally q.stop()
    spark.table("curated").collect().toSeq
  }

  private val good =
    "the quick brown fox jumps over the lazy dog again and again"

  test("quality gates drop short and punctuation-heavy docs") {
    val rows = drive(Seq(Seq(
      Doc(1, ts("10:00"), good, "en", "s"),
      Doc(2, ts("10:01"), "too short", "en", "s"),
      Doc(3, ts("10:02"), "!!! ??? ... ;;; ::: ,,, one two three four five", "en", "s"))))
    assert(rows.map(_.getAs[Long]("doc_id")).toSet == Set(1L))
  }

  test("within-watermark duplicates collapse to one admitted doc") {
    val rows = drive(Seq(
      Seq(Doc(1, ts("10:00"), good, "en", "s"),
        Doc(2, ts("10:05"), good, "en", "s")),
      Seq(Doc(3, ts("10:10"), good, "en", "s"),
        Doc(4, ts("10:11"), good + " but different", "en", "s"))))
    // all four share a hash except doc 4
    assert(rows.length == 2)
    assert(rows.map(_.getAs[Long]("doc_id")).toSet.contains(4L))
  }

  test("pred_lang and stats columns are attached") {
    val rows = drive(Seq(Seq(Doc(1, ts("10:00"), good, "en", "s"))))
    val r = rows.head
    assert(r.getAs[String]("pred_lang") != null)
    assert(r.getAs[Int]("n_tokens") == 12)
    assert(r.getAs[Double]("punct_ratio") == 0.0)
    assert(r.getAs[String]("content_hash").length == 32)
  }
}
