package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** The reference's Exhauster channel (`/root/reference/src/main/kotlin/io/
  * marauder/tank/Exhauster.kt:28-40`): rejected features are
  * POSTed as JSON to a configured HTTP endpoint so an external system can
  * triage them. Here the DURABLE dead-letter remains the parquet side-sink
  * ([[FeatureStore.writeRejected]] — SURVEY §2.4 I6's declared mapping);
  * this fan-out is the optional live wire on top.
  *
  * Scale shape: rows POST from the EXECUTORS (`foreachPartition`), so the
  * driver never materializes the rejected set and throughput scales with
  * partitions. Posts are best-effort with bounded timeouts — an unreachable
  * endpoint slows the sink but cannot fail the ingest, and every row is
  * already durable in parquet (the reference's fire-and-forget coroutine
  * has the same no-retry semantics).
  */
object Exhauster {

  /** POST each rejected row's original JSON body to `url`; returns how many
    * rows got a 2xx/3xx response.
    */
  def post(rejected: DataFrame, url: String,
           timeoutMs: Int = 5000): Long = {
    val acc = rejected.sparkSession.sparkContext.longAccumulator("exhauster_posted")
    rejected.select(col("raw")).foreachPartition { (it: Iterator[Row]) =>
      it.foreach { r =>
        val body = r.getString(0)
        if (body != null) {
          try {
            val conn = new java.net.URI(url).toURL.openConnection()
              .asInstanceOf[java.net.HttpURLConnection]
            conn.setRequestMethod("POST")
            conn.setDoOutput(true)
            conn.setConnectTimeout(timeoutMs)
            conn.setReadTimeout(timeoutMs)
            conn.setRequestProperty("Content-Type", "application/json")
            val os = conn.getOutputStream
            os.write(body.getBytes("UTF-8"))
            os.close()
            val code = conn.getResponseCode
            if (code < 400) { acc.add(1L); conn.getInputStream.close() }
            else Option(conn.getErrorStream).foreach(_.close())
            conn.disconnect()
          } catch { case _: Exception => () } // best-effort; parquet is durable
        }
      }
    }
    acc.value
  }
}
