package graft.operators

import graft.SparkSpec

class LinkPredictionSpec extends SparkSpec {
  import spark.implicits._

  test("path graph: hand-computed CN, Adamic-Adar, Jaccard; no-CN pairs absent") {
    // 1–2–3–4: candidates (1,3) via 2 and (2,4) via 3; (1,4) shares nothing
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("s", "d")
    val got = LinkPrediction.topCandidates(edges, "s", "d", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got.keySet === Set((1L, 3L), (2L, 4L)))
    val (cn13, aa13, j13) = got((1L, 3L))
    assert(cn13 === 1L && math.abs(aa13 - 1.0 / math.log(2)) < 1e-12)
    assert(j13 === 0.5) // 1 / (1 + 2 − 1)
    val (cn24, _, j24) = got((2L, 4L))
    assert(cn24 === 1L && j24 === 0.5)
  }

  test("square: two-CN candidates with Jaccard 1; triangle yields nothing") {
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("s", "d")
    val got = LinkPrediction.topCandidates(square, "s", "d", k = 10)
      .orderBy("u", "v").collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 3L), (2L, 4L)))
    got.foreach { r =>
      assert(r.getLong(2) === 2L)
      assert(math.abs(r.getDouble(3) - 2.0 / math.log(2)) < 1e-12)
      assert(r.getDouble(4) === 1.0)
    }
    // a triangle's every 2-path endpoint pair is already an edge
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("s", "d")
    assert(LinkPrediction.topCandidates(tri, "s", "d", k = 10).count() === 0L)
  }

  test("k-cut is the deterministic (cn desc, u, v) total order") {
    // star around 0 with leaves 1..5: every leaf pair has cn = 1 → ties
    // broken by (u, v); k = 3 keeps (1,2),(1,3),(1,4)
    val star = (1L to 5L).map(i => (0L, i)).toDF("s", "d")
    val got = LinkPrediction.topCandidates(star, "s", "d", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((1L, 2L), (1L, 3L), (1L, 4L)))
  }
}
