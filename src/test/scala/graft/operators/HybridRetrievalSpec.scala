package graft.operators

import graft.SparkSpec

class HybridRetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("rankTopN: rounded-score ordering, id ties, null scores dropped, cut applied") {
    val scored = Seq(
      (1L, 0.5), (2L, 0.5000000001), // equal after round-6 → id order
      (3L, 0.9), (4L, Double.NaN), (5L, 0.1))
      .toDF("id", "s")
      .withColumn("s", org.apache.spark.sql.functions
        .when(org.apache.spark.sql.functions.isnan($"s"), null).otherwise($"s"))
    val got = HybridRetrieval.rankTopN(scored, "id", "s", topN = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(3L -> 1, 1L -> 2, 2L -> 3), "0.5 ties break to the smaller id")
  }

  test("rrfFuse: hand-computed fusion, overlap counted once per system") {
    val a = Seq((10L, 1), (11L, 2), (12L, 3)).toDF("id", "rank")
    val b = Seq((11L, 1), (13L, 2)).toDF("id", "rank")
    val got = HybridRetrieval.rrfFuse(Seq(a, b), "id", k0 = 60)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    assert(got(11L)._1 === 2)
    assert(math.abs(got(11L)._2 - (1.0 / 62 + 1.0 / 61)) < 1e-15)
    assert(got(10L) === ((1, 1.0 / 61)))
    assert(got(13L) === ((1, 1.0 / 62)))
    // the doc ranked in BOTH systems outscores every single-system doc here
    assert(got(11L)._2 > got(10L)._2 && got(11L)._2 > got(13L)._2)
  }
}
