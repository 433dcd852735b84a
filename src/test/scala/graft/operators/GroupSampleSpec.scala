package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class GroupSampleSpec extends SparkSpec {
  import spark.implicits._

  test("exactly k per group; short groups return whole; deterministic") {
    val docs = graft.Tables.load(spark, sf(), "documents")
    val tiny = docs.filter("source = 'src0'").limit(3) // a 3-row stratum
    val df = docs.filter("source <> 'src0'").unionByName(tiny)
    val got = Curation.sampleExactKPerGroup(df, "source", "doc_id", k = 5, seed = "gs")
    val sizes = got.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes("src0") === 3, "group smaller than k returns whole")
    assert(sizes.filterKeys(_ != "src0").values.forall(_ === 5))
    val again = Curation.sampleExactKPerGroup(df, "source", "doc_id", k = 5, seed = "gs")
    assert(got.select("doc_id").collect().map(_.getLong(0)).sorted
      === again.select("doc_id").collect().map(_.getLong(0)).sorted)
  }

  test("picks the k hash-smallest keys per group (window reference)") {
    val docs = graft.Tables.load(spark, sf(), "documents")
    val w = Window.partitionBy("source")
      .orderBy(Curation.hashUnit(col("doc_id"), "gs2"), col("doc_id"))
    val expected = docs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= 4)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val got = Curation.sampleExactKPerGroup(docs, "source", "doc_id", k = 4, seed = "gs2")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(got === expected)
  }
}
