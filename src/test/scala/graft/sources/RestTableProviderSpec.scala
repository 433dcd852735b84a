package graft.sources

import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkSpec
import Http._

/** The DSv2 REST table against the in-memory fake server: full reads,
  * offset-range partition planning, and agreement with the driver-side
  * pagedJson loop.
  */
class RestTableProviderSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType)))

  private def register(): Unit = {
    FakeServer.reset()
    RestTableProvider.registerEndpoint("fake",
      new Authed(new FakeServer.Fake, new FakeServer.Tokens))
  }

  private def read(extra: (String, String)*) = {
    val base = spark.read
      .format("graft.sources.RestTableProvider")
      .schema(schema)
      .option("endpoint", "fake")
      .option("path", "/snap")
      .option("limit", "50")
    extra.foldLeft(base)((r, kv) => r.option(kv._1, kv._2)).load()
  }

  test("sequential read (unknown extent) fetches the complete snapshot") {
    register()
    val df = read()
    assert(df.rdd.getNumPartitions === 1)
    assert(df.count() === FakeServer.snapshotSize)
    assert(df.selectExpr("sum(id)").collect().head.getLong(0) ===
      (0L until FakeServer.snapshotSize).sum)
  }

  test("totalCount plans offset-range partitions; rows covered exactly once") {
    register()
    val df = read("totalCount" -> FakeServer.snapshotSize.toString, "numPartitions" -> "4")
    assert(df.rdd.getNumPartitions === 4)
    val ids = df.collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === (0L until FakeServer.snapshotSize))
  }

  test("DSv2 read equals the driver-side pagedJson loop") {
    register()
    val authed = new Authed(new FakeServer.Fake, new FakeServer.Tokens)
    val loop = RestSource.pagedJson(spark, authed, "/snap", schema, limit = 50)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val dsv2 = read().collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(dsv2 === loop)
  }

  test("bounded range survives a server that clamps page size (no silent truncation)") {
    FakeServer.reset()
    // server honors at most 30 rows per page regardless of the requested limit
    val clamping = new Transport {
      private val inner = new FakeServer.Fake
      def send(req: Request): Response = {
        val asked = req.params.get("limit").map(_.toInt).getOrElse(30)
        inner.send(req.copy(params = req.params + ("limit" -> math.min(asked, 30).toString)))
      }
    }
    RestTableProvider.registerEndpoint("clamped",
      new Authed(clamping, new FakeServer.Tokens))
    val df = spark.read.format("graft.sources.RestTableProvider").schema(schema)
      .option("endpoint", "clamped").option("path", "/snap").option("limit", "100")
      .option("totalCount", FakeServer.snapshotSize.toString).option("numPartitions", "2")
      .load()
    assert(df.collect().map(_.getLong(0)).sorted.toSeq === (0L until FakeServer.snapshotSize))
  }

  test("malformed record yields a null row (PERMISSIVE), not a task crash") {
    val broken = new Transport {
      def send(req: Request): Response =
        if (req.params("offset").toInt > 0) Response(200, "[]")
        else Response(200, """[{"id":1,"name":"ok"},{"id":2,"name":]""")
    }
    RestTableProvider.registerEndpoint("broken",
      new Authed(broken, new FakeServer.Tokens))
    val rows = spark.read.format("graft.sources.RestTableProvider").schema(schema)
      .option("endpoint", "broken").option("path", "/x").load()
      .collect()
    assert(rows.length === 2)
    assert(rows.count(_.isNullAt(0)) === 1) // the malformed record
    assert(rows.exists(r => !r.isNullAt(0) && r.getLong(0) == 1L))
  }

  test("missing schema and unregistered endpoint fail with guidance") {
    register()
    val noSchema = intercept[Exception] {
      spark.read.format("graft.sources.RestTableProvider")
        .option("endpoint", "fake").option("path", "/snap").load()
    }
    assert(noSchema.getMessage.toLowerCase.contains("schema"))
    val unregistered = intercept[Exception] {
      spark.read.format("graft.sources.RestTableProvider").schema(schema)
        .option("endpoint", "nope").option("path", "/snap").load().collect()
    }
    assert(unregistered.getMessage.contains("registerEndpoint"))
  }
}
