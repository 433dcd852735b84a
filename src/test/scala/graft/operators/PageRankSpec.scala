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

  test("personalized: hand-computed 3 iterations on a path with a dangling sink") {
    import spark.implicits._
    // 1 -> 2 -> 3; 3 dangles; seed = {1}. Teleport AND dangling mass
    // return to the seed, so mass cycles 1 -> 2 -> 3 -> (dangling) -> 1.
    val edges = Seq((1L, 2L, 1.0), (2L, 3L, 1.0)).toDF("src", "dst", "weight")
    val got = PageRank.personalized(edges, seeds = Seq(1L), iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // r0 = (1, 0, 0); r1 = (.15, .85, 0); r2 = (.15, .1275, .7225)
    // r3: dm = .7225 -> 1: .15 + .85*.7225 = .764125; 2: .85*.15; 3: .85*.1275
    val want = Map(1L -> 0.764125, 2L -> 0.1275, 3L -> 0.108375)
    want.foreach { case (k, v) =>
      assert(math.abs(got(k) - v) < 1e-12, s"node $k: got ${got(k)} want $v")
    }
    assert(math.abs(got.values.sum - 1.0) < 1e-12, "ranks stay a distribution")
  }

  test("personalized: non-seed unreachable nodes get zero, seeds split teleport evenly") {
    import spark.implicits._
    // two disconnected components; seeds in the first only
    val edges = Seq((1L, 2L, 1.0), (2L, 1L, 1.0), (10L, 11L, 1.0), (11L, 10L, 1.0))
      .toDF("src", "dst", "weight")
    val got = PageRank.personalized(edges, seeds = Seq(1L, 2L), iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(10L) === 0.0 && got(11L) === 0.0, "no path from seeds → rank 0")
    assert(math.abs(got(1L) - 0.5) < 1e-12 && math.abs(got(2L) - 0.5) < 1e-12,
      "symmetric 2-cycle seeds hold the whole distribution evenly")
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
