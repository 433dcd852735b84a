package graft.operators

import graft.SparkSpec

class HoltWintersSpec extends SparkSpec {
  import spark.implicits._

  test("matches a driver-side reference recursion (period 3)") {
    val xs = Seq(10.0, 20.0, 30.0, 14.0, 24.0, 34.0, 16.0)
    val docs = xs.zipWithIndex.map { case (x, i) => (1L, i, x) }
      .toDF("k", "t", "x")
    val got = TimeSeries.holtWinters(docs, "k", "t", "x", period = 3)
      .collect()
      .map(r => r.getInt(1) ->
        (Option(r.get(3)).map(_.asInstanceOf[Double]),
          Option(r.get(4)).map(_.asInstanceOf[Double]),
          Option(r.get(5)).map(_.asInstanceOf[Double]),
          Option(r.get(6)).map(_.asInstanceOf[Double])))
      .toMap

    // reference: same dyadic recursion
    val m = 3
    val m0 = ((0.0 + xs(0)) + xs(1) + xs(2)) / 3.0
    var level = m0; var trend = 0.0
    val s = scala.collection.mutable.ArrayBuffer(
      xs(0) - m0, xs(1) - m0, xs(2) - m0)
    assert(got(0) === ((None, None, None, None)))
    assert(got(1) === ((None, None, None, None)))
    assert(got(2) === ((Some(m0), Some(0.0), Some(xs(2) - m0), None)))
    for (t <- 3 until xs.length) {
      val sPrev = s(t - m)
      val fit = level + trend + sPrev
      val lNew = ((xs(t) - sPrev) + (level + trend)) / 2.0
      val bNew = ((lNew - level) + trend) / 2.0
      val sNew = ((xs(t) - lNew) + sPrev) / 2.0
      assert(got(t) === ((Some(lNew), Some(bNew), Some(sNew), Some(fit))), s"t=$t")
      level = lNew; trend = bNew; s += sNew
    }
  }

  test("constant series: level sticks, trend and seasonals zero, residuals zero") {
    val docs = (0 until 10).map(i => (1L, i, 5.0)).toDF("k", "t", "x")
    val got = TimeSeries.holtWinters(docs, "k", "t", "x", period = 7)
      .where($"fitted".isNotNull)
      .collect()
    assert(got.length === 3)
    got.foreach { r =>
      assert(r.getDouble(3) === 5.0 && r.getDouble(4) === 0.0 &&
        r.getDouble(5) === 0.0 && r.getDouble(6) === 5.0 &&
        r.getDouble(7) === 0.0)
    }
  }

  test("keys with fewer than `period` points are excluded") {
    val docs = (Seq((1L, 0, 1.0), (1L, 1, 2.0)) ++
      (0 until 4).map(i => (2L, i, 1.0))).toDF("k", "t", "x")
    val got = TimeSeries.holtWinters(docs, "k", "t", "x", period = 3)
    assert(got.select("k").distinct().collect().map(_.getLong(0)).toSet === Set(2L))
  }
}
