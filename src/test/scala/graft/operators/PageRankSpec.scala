package graft.operators

import graft.SparkSpec

class PageRankSpec extends SparkSpec {

  test("matches a hand-computed iteration on a graph with a dangling node") {
    import spark.implicits._
    // 1 -> 2 (w2), 1 -> 3 (w1), 2 -> 3 (w1); 3 dangles
    val edges = Seq(
      (1L, 2L, 2.0), (1L, 3L, 1.0), (2L, 3L, 1.0)
    ).toDF("src", "dst", "weight")
    val got = PageRank.run(edges, iterations = 1, damping = 0.85)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    val n = 3.0
    val r0 = 1.0 / n
    val dm = r0 // node 3 dangles
    def expect(inSum: Double) = 0.15 / n + 0.85 * (inSum + dm / n)
    val want = Map(
      1L -> expect(0.0),
      2L -> expect(r0 * (2.0 / 3.0)),
      3L -> expect(r0 * (1.0 / 3.0) + r0 * 1.0))
    want.foreach { case (k, v) =>
      assert(math.abs(got(k) - v) < 1e-12, s"node $k: got ${got(k)} want $v")
    }
    assert(math.abs(got.values.sum - 1.0) < 1e-12, "ranks stay a distribution")
  }

  test("converges toward the authority on a star graph") {
    import spark.implicits._
    val edges = (2L to 6L).map(i => (i, 1L, 1.0)).toDF("src", "dst", "weight")
    val ranks = PageRank.run(edges, iterations = 5, damping = 0.85)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ranks(1L) > 0.4, s"hub must dominate, got ${ranks(1L)}")
    (2L to 6L).foreach(i => assert(ranks(i) < ranks(1L)))
    assert(math.abs(ranks.values.sum - 1.0) < 1e-12)
  }
}
