package graft.operators

import graft.SparkSpec

class HitsSpec extends SparkSpec {

  test("matches a hand-computed iteration; sink has zero hub, source zero authority") {
    import spark.implicits._
    // a -> b, a -> c, b -> c (unit weights). a is pure source, c pure sink.
    val edges = Seq((1L, 2L, 1.0), (1L, 3L, 1.0), (2L, 3L, 1.0))
      .toDF("src", "dst", "weight")
    val got = Hits.run(edges, iterations = 1)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap

    // h0 = 1/3 each. authRaw: b = 1/3, c = 1/3 + 1/3 = 2/3; L1 total 1
    //   -> auth = (a 0, b 1/3, c 2/3)
    // hubRaw: a = auth(b) + auth(c) = 1, b = auth(c) = 2/3; total 5/3
    //   -> hub = (a 3/5, b 2/5, c 0)
    val want = Map(
      1L -> ((3.0 / 5.0, 0.0)),
      2L -> ((2.0 / 5.0, 1.0 / 3.0)),
      3L -> ((0.0, 2.0 / 3.0)))
    want.foreach { case (k, (h, a)) =>
      assert(math.abs(got(k)._1 - h) < 1e-12, s"node $k hub: got ${got(k)._1} want $h")
      assert(math.abs(got(k)._2 - a) < 1e-12, s"node $k auth: got ${got(k)._2} want $a")
    }
    assert(math.abs(got.values.map(_._1).sum - 1.0) < 1e-12, "hubs stay L1-normalized")
    assert(math.abs(got.values.map(_._2).sum - 1.0) < 1e-12, "authorities stay L1-normalized")
  }

  test("matches an in-test reference power iteration over 3 rounds") {
    import spark.implicits._
    val edgeList = Seq((1L, 2L, 2.0), (1L, 3L, 1.0), (2L, 3L, 1.0),
      (3L, 1L, 4.0), (2L, 1L, 0.5))
    val nodes = Seq(1L, 2L, 3L)
    def l1(v: Map[Long, Double]): Map[Long, Double] = {
      val t = v.values.sum
      v.map { case (k, x) => k -> x / t }
    }
    var hub = nodes.map(_ -> 1.0 / nodes.size).toMap
    var auth = Map.empty[Long, Double]
    (1 to 3).foreach { _ =>
      auth = l1(nodes.map(n =>
        n -> edgeList.filter(_._2 == n).map(e => e._3 * hub(e._1)).sum).toMap)
      hub = l1(nodes.map(n =>
        n -> edgeList.filter(_._1 == n).map(e => e._3 * auth(e._2)).sum).toMap)
    }
    val got = Hits.run(edgeList.toDF("src", "dst", "weight"), iterations = 3)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    nodes.foreach { n =>
      assert(math.abs(got(n)._1 - hub(n)) < 1e-12, s"node $n hub: got ${got(n)._1} want ${hub(n)}")
      assert(math.abs(got(n)._2 - auth(n)) < 1e-12, s"node $n auth: got ${got(n)._2} want ${auth(n)}")
    }
  }

  test("regular symmetric graph is a fixed point: hub = authority = uniform") {
    import spark.implicits._
    // the directed triangle both ways: 2-regular, so uniform scores are
    // the exact eigenvector and every iteration reproduces them
    val und = Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (3L, 1L, 1.0))
    val edges = (und ++ und.map { case (a, b, w) => (b, a, w) })
      .toDF("src", "dst", "weight")
    Hits.run(edges, iterations = 3).collect().foreach { r =>
      assert(math.abs(r.getDouble(1) - 1.0 / 3.0) < 1e-12, s"hub drifted: $r")
      assert(math.abs(r.getDouble(2) - 1.0 / 3.0) < 1e-12, s"authority drifted: $r")
    }
  }

  test("weight sensitivity: doubling an edge weight shifts authority toward its target") {
    import spark.implicits._
    val base = Seq((1L, 2L, 1.0), (1L, 3L, 1.0)).toDF("src", "dst", "weight")
    val skew = Seq((1L, 2L, 2.0), (1L, 3L, 1.0)).toDF("src", "dst", "weight")
    def auth(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      Hits.run(df, iterations = 2).collect()
        .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val (b, s) = (auth(base), auth(skew))
    assert(math.abs(b(2L) - b(3L)) < 1e-12, "equal weights tie the two targets")
    assert(s(2L) > s(3L), "the heavier edge's target takes more authority")
  }
}
