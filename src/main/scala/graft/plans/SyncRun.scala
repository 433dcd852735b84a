package graft.plans

import java.time.Instant

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.operators.{SchemaValidation, SyncDiff}
import graft.sources.{FileSinks, Http, RestSink}

/** The reference's top-level sync lifecycle (SisConnectorApp →
  * SisConnectorService.handleRequest, SURVEY.md §3.1) as one composed,
  * re-runnable operation:
  *
  *   1. coerce + validate the raw source rows; quarantine violations
  *      (the auditable form of the reference's log-and-continue at
  *      SisConnectorService.java:147-158 — bad rows there fail their POST
  *      one at a time and vanish into the log; here they land in a
  *      machine-readable quarantine frame with per-row reasons, counted
  *      in the run report);
  *   2. assemble source entities from the VALID rows (the §3.2 pipeline,
  *      one Spark plan);
  *   3. diff against the target snapshot (anti-join — J4). Quarantined
  *      keys are withheld from the delete set: a row failing validation
  *      means "don't touch it this run", not "remove it from the target";
  *   4. upsert every source entity, delete the orphans (distributed,
  *      idempotent sinks);
  *   5. render the run report from sink counters (S11/A5) + quarantine
  *      count.
  *
  * Re-running after source changes gives the reference's incremental-sync
  * behavior: upserts converge (POST-as-upsert), deletes are 404-tolerant.
  * Wall-clock timestamps are injected so runs are reproducible in tests.
  */
object SyncRun {

  /** Ingest contract for the customer source. Wide-open ranges: clean
    * warehouse data must never quarantine; the rules exist to catch
    * structurally broken rows (null keys, unparseable numerics after
    * [[SchemaValidation.coerce]], absurd out-of-domain values).
    */
  val customerCoercions: Map[String, String] = Map(
    "c_custkey" -> "bigint",
    "c_nationkey" -> "bigint",
    "c_acctbal" -> "double")

  val customerRules: Seq[SchemaValidation.FieldRule] = Seq(
    SchemaValidation.FieldRule("c_custkey", required = true),
    SchemaValidation.FieldRule("c_name", required = true),
    SchemaValidation.FieldRule("c_nationkey", required = true,
      min = Some(0), max = Some(1e6)),
    SchemaValidation.FieldRule("c_acctbal", min = Some(-1e9), max = Some(1e9)))

  final case class Result(
      upserts: Long,
      deletes: Long,
      quarantined: Long,
      report: FileSinks.RunReport)

  def run(
      spark: SparkSession,
      sfDir: String,
      transport: Http.Transport,
      tokens: Http.TokenSource,
      entityPath: String,
      reportDir: Option[String] = None,
      quarantineDir: Option[String] = None,
      customerOverride: Option[DataFrame] = None,
      now: () => Instant = () => Instant.now()): Result = {
    val started = now()

    val rawCustomer = customerOverride.getOrElse(
      graft.Tables.load(spark, sfDir, "customer"))
    val validated = SchemaValidation.validate(
      SchemaValidation.coerce(rawCustomer, customerCoercions), customerRules)
    val (validCustomer, quarantine0) = SchemaValidation.split(validated)
    // the quarantine frame is consumed three times (sink, count, delete
    // withholding) — materialize the (small) slice once instead of
    // re-scanning + re-validating the raw source per consumer
    val quarantine = quarantine0.localCheckpoint(true)
    quarantineDir.foreach(d =>
      quarantine.withColumn("errors", org.apache.spark.sql.functions
        .concat_ws(",", col("errors")))
        .write.mode("overwrite").json(d))
    val nQuarantined = quarantine.count()

    val source = EntityAssembly.toJsonPayload(EntityAssembly.assembleFrom(
      validCustomer,
      graft.Tables.load(spark, sfDir, "nation"),
      graft.Tables.load(spark, sfDir, "orders"),
      graft.Tables.load(spark, sfDir, "lineitem")))

    // deletes = target − (assembled ∪ quarantined): a quarantined row is
    // "skip this run", never an implicit delete of its target twin
    val withheld = source.select("studentUniqueId").union(
      quarantine.select(col("c_custkey").cast("bigint").as("studentUniqueId"))
        .filter(col("studentUniqueId").isNotNull))
    val plan = SyncDiff.plan(
      source = withheld,
      target = graft.Tables.load(spark, sfDir, "customer")
        .select(col("c_custkey").as("studentUniqueId")),
      keyCols = Seq("studentUniqueId"))

    // a sink failure must still produce a report (S11 contract: counts +
    // errors), not abort the run silently
    val (up, upErr) =
      try (RestSink.upsert(source, transport, tokens, entityPath), None)
      catch { case e: Exception => (RestSink.SinkReport(0, 0), Some(s"upsert: ${e.getMessage}")) }
    val (del, delErr) =
      try (RestSink.delete(plan.deletes, "studentUniqueId", transport, tokens, entityPath), None)
      catch { case e: Exception => (RestSink.SinkReport(0, 0), Some(s"delete: ${e.getMessage}")) }

    // every quarantine consumer has run — release the pinned blocks
    org.apache.spark.sql.graft.bridge.freeLocalCheckpoint(quarantine)

    val finished = now()
    val report = FileSinks.RunReport(
      startedAt = started.toString,
      finishedAt = finished.toString,
      upsertCount = up.succeeded,
      deleteCount = del.succeeded,
      errors = Seq(upErr, delErr).flatten,
      quarantineCount = nQuarantined)
    reportDir.foreach(d =>
      FileSinks.writeReport(report, d, started.toString.replaceAll("[:.]", "-")))
    Result(up.succeeded, del.succeeded, nQuarantined, report)
  }
}
