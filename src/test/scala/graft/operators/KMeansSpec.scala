package graft.operators

import graft.SparkSpec

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  test("two blobs separate in two rounds even from same-blob seeds") {
    // seeds are ids 0 and 1 — BOTH in the left blob; the second round
    // must still pull the far blob onto its own centroid
    val pts = Seq(
      (0L, Seq(0.0, 0.0)),
      (1L, Seq(0.1, 0.0)),
      (2L, Seq(10.0, 10.0)),
      (3L, Seq(10.1, 10.0))).toDF("id", "emb")
    val got = KMeans.assign(pts, "id", "emb", k = 2, iterations = 2)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    assert(got(0L)._1 === 0 && got(1L)._1 === 0)
    assert(got(2L)._1 === 1 && got(3L)._1 === 1)
    // cluster 0's centroid stayed at its singleton seed (0,0) after
    // round 1, so the final distances are exact
    assert(got(0L)._2 === 0.0)
    assert(math.abs(got(1L)._2 - 0.01) < 1e-12)
    val summary = KMeans.clusterSummary(pts, "id", "emb", k = 2, iterations = 2)
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(summary === Seq((0, 2), (1, 2)))
  }

  test("k = n degenerates to identity clustering with zero inertia") {
    val pts = Seq(
      (5L, Seq(1.0, 2.0)), (6L, Seq(3.0, 4.0)), (7L, Seq(5.0, 6.0))).toDF("id", "emb")
    val summary = KMeans.clusterSummary(pts, "id", "emb", k = 3, iterations = 2)
      .collect()
    assert(summary.length === 3)
    summary.foreach { r =>
      assert(r.getInt(1) === 1 && r.getDouble(2) === 0.0)
    }
  }

  test("assignment ties break to the smaller cluster index") {
    // point 2 is exactly equidistant from both seeds → cluster 0
    val pts = Seq(
      (0L, Seq(0.0)), (1L, Seq(2.0)), (2L, Seq(1.0))).toDF("id", "emb")
    val got = KMeans.assign(pts, "id", "emb", k = 2, iterations = 1)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got(2L) === 0)
  }
}
