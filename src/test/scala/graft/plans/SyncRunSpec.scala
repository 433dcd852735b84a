package graft.plans

import java.time.Instant

import graft.SparkSpec
import graft.sources.FakeServer

class SyncRunSpec extends SparkSpec {

  test("full sync run: upserts in-segment entities, deletes the rest, reports counts") {
    FakeServer.reset()
    val dir = java.nio.file.Files.createTempDirectory("graft_sync_report").toString
    val t0 = Instant.parse("2026-01-01T00:00:00Z")
    val result = SyncRun.run(
      spark, sf(),
      new FakeServer.Fake, new FakeServer.Tokens,
      entityPath = "/entities",
      reportDir = Some(dir),
      now = () => t0)

    val customer = spark.read.parquet(s"${sf()}/customer.parquet")
    val inSegment = customer
      .filter(org.apache.spark.sql.functions.col("c_mktsegment") === EntityAssembly.segment)
      .count()
    assert(result.upserts === inSegment)
    assert(result.deletes === customer.count() - inSegment)
    // server converged to exactly the upserted key set
    assert(FakeServer.store.size() === inSegment)
    // report rendered to disk with injected timestamps
    val files = new java.io.File(dir).listFiles()
    assert(files.length === 1)
    val text = java.nio.file.Files.readString(files(0).toPath)
    assert(text.contains(s"upserts:  $inSegment"))
    assert(text.contains("started:  2026-01-01T00:00:00Z"))
  }

  test("sink failure is recorded in the report, not thrown") {
    val failing = new graft.sources.Http.Transport {
      def send(req: graft.sources.Http.Request) = graft.sources.Http.Response(500, "")
    }
    val result = SyncRun.run(spark, sf(), failing, new FakeServer.Tokens, "/entities")
    assert(result.upserts === 0)
    assert(result.report.errors.exists(_.startsWith("upsert:")))
    assert(result.report.errors.exists(_.startsWith("delete:")))
  }

  test("bad rows quarantine with reasons; their keys are withheld from deletes") {
    import org.apache.spark.sql.functions._
    FakeServer.reset()
    val qdir = java.nio.file.Files.createTempDirectory("graft_quarantine").toString
    val customer = graft.Tables.load(spark, sf(), "customer")
    val keyType = customer.schema("c_custkey").dataType
    // an existing OUT-of-segment key, duplicated as a broken row: its
    // target twin must survive the delete wave because the row quarantined
    val victimKey = customer
      .filter(col("c_mktsegment") =!= EntityAssembly.segment)
      .agg(max("c_custkey")).head().get(0)
    val badNullKey = customer.limit(1)
      .withColumn("c_custkey", lit(null).cast(keyType))
    val badNullName = customer.filter(col("c_custkey") === victimKey)
      .withColumn("c_name", lit(null).cast("string"))
    val wave = customer.union(badNullKey).union(badNullName)

    val result = SyncRun.run(
      spark, sf(), new FakeServer.Fake, new FakeServer.Tokens, "/entities",
      quarantineDir = Some(qdir),
      customerOverride = Some(wave))

    val inSegment = customer
      .filter(col("c_mktsegment") === EntityAssembly.segment).count()
    assert(result.quarantined === 2)
    assert(result.report.quarantineCount === 2)
    assert(result.upserts === inSegment)
    // all-but-one out-of-segment rows deleted: the quarantined victim is withheld
    assert(result.deletes === customer.count() - inSegment - 1)
    assert(result.report.render.contains("quarantined: 2"))
    // quarantine frame carries machine-readable reasons
    val reasons = spark.read.json(qdir).select("errors")
      .collect().map(_.getString(0)).toSet
    assert(reasons.exists(_.contains("c_custkey:required_null")))
    assert(reasons.exists(_.contains("c_name:required_null")))
  }

  test("re-run converges (idempotent): same counts, same server state") {
    FakeServer.reset()
    def once() = SyncRun.run(spark, sf(), new FakeServer.Fake, new FakeServer.Tokens, "/entities")
    val first = once()
    val second = once()
    assert(first.upserts === second.upserts)
    assert(FakeServer.store.size() === first.upserts)
  }
}
