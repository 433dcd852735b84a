package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, struct, to_json}
import org.apache.spark.util.LongAccumulator

import Http._

/** REST write sinks: POST-as-upsert and DELETE-by-id, the reference's
  * S8/S9 (TeacherCandidatesApi POST :615-627, DELETE :126-141, driven one
  * record at a time on a single thread — SisConnectorService.java:184-198,
  * 472-487).
  *
  * Spark-first restatement: `foreachPartition` — every partition opens its
  * own authed session and streams its rows through the transport, so write
  * throughput scales with executors instead of being a driver loop.
  * Idempotency makes task retries safe: Ed-Fi POST is upsert-by-natural-key
  * (re-POST converges), and DELETE treats 404 as success (already gone —
  * exactly what a retried delete sees).
  */
object RestSink {

  final case class SinkReport(attempted: Long, succeeded: Long)

  /** POST every row of `df` as a JSON document to `path`. Returns counts
    * from accumulators (the run-report plumbing, S11/A5).
    */
  def upsert(
      df: DataFrame,
      transport: Transport,
      tokens: TokenSource,
      path: String): SinkReport = {
    val spark = df.sparkSession
    val attempted = spark.sparkContext.longAccumulator("graft.upsert.attempted")
    val succeeded = spark.sparkContext.longAccumulator("graft.upsert.succeeded")
    val payloads = df.select(to_json(struct(df.columns.map(col): _*)).as("json"))
    payloads.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      val authed = new Authed(transport, tokens)
      it.foreach { row =>
        attempted.add(1)
        val resp = authed.call(Request("POST", path, body = row.getString(0)))
        if (resp.status / 100 == 2) succeeded.add(1)
        else throw new RuntimeException(s"POST $path failed: HTTP ${resp.status}")
      }
    }
    SinkReport(attempted.value, succeeded.value)
  }

  /** DELETE each id in `df(idCol)`; 404 counts as success (idempotent
    * delete under task retry — the reference's delete-after-reauth path
    * would crash on it).
    */
  def delete(
      df: DataFrame,
      idCol: String,
      transport: Transport,
      tokens: TokenSource,
      path: String): SinkReport = {
    val spark = df.sparkSession
    val attempted = spark.sparkContext.longAccumulator("graft.delete.attempted")
    val succeeded = spark.sparkContext.longAccumulator("graft.delete.succeeded")
    df.select(col(idCol).cast("string")).foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      val authed = new Authed(transport, tokens)
      it.foreach { row =>
        attempted.add(1)
        val resp = authed.call(Request("DELETE", s"$path/${row.getString(0)}"))
        if (resp.status / 100 == 2 || resp.status == 404) succeeded.add(1)
        else throw new RuntimeException(s"DELETE failed: HTTP ${resp.status}")
      }
    }
    SinkReport(attempted.value, succeeded.value)
  }
}
