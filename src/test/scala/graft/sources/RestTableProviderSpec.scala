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
