package graft

import java.nio.file.{Files, Paths}
import java.time.Instant

import org.apache.spark.sql.functions.col

import graft.plans.EntityAssembly
import graft.sources.MemoryServer

/** The config-driven application entry end to end: a properties file +
  * sql/map fixture directories drive registry compile, CSV dumps, the
  * full sync lifecycle against the loopback server, and the report file —
  * the engine's equivalent of launching the reference via run.sh with
  * runtime/input/application.properties.
  */
class SyncAppSpec extends SparkSpec {

  private def writeFixture(
      save: Boolean = true,
      dumps: Boolean = true,
      store: String = "syncapp_spec"): (SyncApp.Config, String) = {
    val root = Files.createTempDirectory("graft_syncapp")
    val sqlDir = Files.createDirectories(root.resolve("sql"))
    val mapDir = Files.createDirectories(root.resolve("map"))
    val outDir = Files.createDirectories(root.resolve("out"))
    Files.writeString(sqlDir.resolve("candidates.sql"),
      "SELECT c_custkey, c_name\nFROM customer\nWHERE c_acctbal > 0\nORDER BY c_custkey")
    Files.writeString(mapDir.resolve("candidates.map"),
      "# logical=PHYSICAL\nstudentId=C_CUSTKEY\nfullName=c_name\nmissing=NO_SUCH_COL")
    val props = root.resolve("application.properties")
    Files.writeString(props,
      s"""# mirrors runtime/input/application.properties keys
         |input.data.dir=${sf()}
         |input.sql.dir=$sqlDir
         |input.columnmap.dir=$mapDir
         |output.dir=$outDir
         |api.base.path=loopback:$store
         |oauth.token.url=loopback
         |tpdm.api.save=$save
         |output.data.to.dir=$dumps
         |""".stripMargin)
    (SyncApp.loadProperties(props), outDir.toString)
  }

  test("properties parse: comments/blanks skipped, missing required key fails loud") {
    val p = Files.createTempFile("graft_props", ".properties")
    Files.writeString(p, "# comment\n\nfoo=bar=baz\n! also comment\noutput.dir=/tmp/x\n")
    val cfg = SyncApp.loadProperties(p)
    assert(cfg.props("foo") === "bar=baz") // split on FIRST '='
    assert(cfg.outputDir === "/tmp/x")
    val e = intercept[RuntimeException](cfg.dataDir)
    assert(e.getMessage.contains("input.data.dir"))
  }

  test("full lifecycle from a config directory: registry, dumps, sync, report") {
    val (cfg, outDir) = writeFixture(store = "syncapp_full")
    MemoryServer.drop("syncapp_full")
    val t0 = Instant.parse("2026-02-02T10:20:30Z")
    val (transport, tokens) = SyncApp.wire(cfg)
    val s = SyncApp.run(spark, cfg, transport, tokens, now = () => t0)

    assert(s.queriesRun === 1)
    // sync converged the loopback store to the in-segment entity set
    val customer = spark.read.parquet(s"${sf()}/customer.parquet")
    val inSegment = customer
      .filter(col("c_mktsegment") === EntityAssembly.segment).count()
    assert(s.result.upserts === inSegment)
    assert(MemoryServer.store("syncapp_full").size() === inSegment)

    // report file rendered under output.dir with the injected timestamp
    val report = Paths.get(s.reportPath)
    assert(Files.exists(report), s"missing report ${s.reportPath}")
    val text = Files.readString(report)
    assert(text.contains(s"upserts:  $inSegment"))
    assert(text.contains("started:  2026-02-02T10:20:30Z"))

    // CSV dump under <out>/<yyyyMMdd>/<HHmmss>/<query>/ with mapped header:
    // mapped logical names, unmapped physical resolved case-insensitively,
    // unresolvable mapped to null column
    val dump = Paths.get(outDir, "20260202", "102030", "candidates")
    assert(Files.isDirectory(dump), s"missing dump $dump")
    val dumped = spark.read.option("header", "true").csv(dump.toString)
    assert(dumped.columns.toSeq === Seq("studentId", "fullName", "missing"))
    assert(dumped.count() ===
      customer.filter(col("c_acctbal") > 0).count())
    assert(dumped.filter(col("missing").isNotNull).count() === 0)
  }

  test("tpdm.api.save=false processes and reports but POSTs nowhere") {
    val (cfg, _) = writeFixture(save = false, dumps = false, store = "syncapp_dry")
    MemoryServer.drop("syncapp_dry")
    val (transport, tokens) = SyncApp.wire(cfg)
    val s = SyncApp.run(spark, cfg, transport, tokens,
      now = () => Instant.parse("2026-02-03T00:00:00Z"))
    // counts still tally (the reference's saveToTPDM guard wraps only the
    // API call; upsertCount increments regardless)
    assert(s.result.upserts > 0)
    assert(MemoryServer.store("syncapp_dry").size() === 0)
  }

  test("re-run converges: idempotent upserts, 404-tolerant deletes") {
    val (cfg, _) = writeFixture(dumps = false, store = "syncapp_rerun")
    MemoryServer.drop("syncapp_rerun")
    val (transport, tokens) = SyncApp.wire(cfg)
    val s1 = SyncApp.run(spark, cfg, transport, tokens,
      now = () => Instant.parse("2026-02-04T00:00:00Z"))
    val size1 = MemoryServer.store("syncapp_rerun").size()
    val s2 = SyncApp.run(spark, cfg, transport, tokens,
      now = () => Instant.parse("2026-02-04T01:00:00Z"))
    assert(s2.result.upserts === s1.result.upserts)
    assert(MemoryServer.store("syncapp_rerun").size() === size1)
  }

  test("unknown api.base.path fails loud instead of silently dropping data") {
    val (cfg0, _) = writeFixture()
    val cfg = SyncApp.Config(cfg0.props + ("api.base.path" -> "https://real.example/api"))
    val e = intercept[RuntimeException](SyncApp.wire(cfg))
    assert(e.getMessage.contains("live HTTP transport"))
  }
}
