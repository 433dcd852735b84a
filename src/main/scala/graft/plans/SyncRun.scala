package graft.plans

import java.time.Instant

import org.apache.spark.sql.SparkSession

import graft.operators.SyncDiff
import graft.sources.{FileSinks, Http, RestSink}

/** The reference's top-level sync lifecycle (SisConnectorApp →
  * SisConnectorService.handleRequest, SURVEY.md §3.1) as one composed,
  * re-runnable operation:
  *
  *   1. assemble source entities (the §3.2 pipeline, one Spark plan);
  *   2. diff against the target snapshot (anti-join — J4);
  *   3. upsert every source entity, delete the orphans (distributed,
  *      idempotent sinks);
  *   4. render the run report from sink counters (S11/A5).
  *
  * Re-running after source changes gives the reference's incremental-sync
  * behavior: upserts converge (POST-as-upsert), deletes are 404-tolerant.
  * Wall-clock timestamps are injected so runs are reproducible in tests.
  */
object SyncRun {

  final case class Result(
      upserts: Long,
      deletes: Long,
      report: FileSinks.RunReport)

  def run(
      spark: SparkSession,
      sfDir: String,
      transport: Http.Transport,
      tokens: Http.TokenSource,
      entityPath: String,
      reportDir: Option[String] = None,
      now: () => Instant = () => Instant.now()): Result = {
    val started = now()

    val source = EntityAssembly.assembleJson(spark, sfDir)
    val plan = SyncDiff.plan(
      source = source.select("studentUniqueId"),
      target = graft.Tables.load(spark, sfDir, "customer")
        .select(org.apache.spark.sql.functions.col("c_custkey").as("studentUniqueId")),
      keyCols = Seq("studentUniqueId"))

    // a sink failure must still produce a report (S11 contract: counts +
    // errors), not abort the run silently
    val (up, upErr) =
      try (RestSink.upsert(source, transport, tokens, entityPath), None)
      catch { case e: Exception => (RestSink.SinkReport(0, 0), Some(s"upsert: ${e.getMessage}")) }
    val (del, delErr) =
      try (RestSink.delete(plan.deletes, "studentUniqueId", transport, tokens, entityPath), None)
      catch { case e: Exception => (RestSink.SinkReport(0, 0), Some(s"delete: ${e.getMessage}")) }

    val finished = now()
    val report = FileSinks.RunReport(
      startedAt = started.toString,
      finishedAt = finished.toString,
      upsertCount = up.succeeded,
      deleteCount = del.succeeded,
      errors = Seq(upErr, delErr).flatten)
    reportDir.foreach(d =>
      FileSinks.writeReport(report, d, started.toString.replaceAll("[:.]", "-")))
    Result(up.succeeded, del.succeeded, report)
  }
}
