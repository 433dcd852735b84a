package graft.operators

import graft.SparkSpec

class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  /** Independent product-limit replay with the operator's rounding. */
  private def replay(rows: Seq[(Long, Int)]): Map[Long, Double] = {
    val times = rows.map(_._1).distinct.sorted
    var s = 1.0
    times.map { t =>
      val n = rows.count(_._1 >= t)
      val d = rows.count(r => r._1 == t && r._2 == 1)
      s *= (n - d).toDouble / n
      t -> BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
  }

  test("the Freireich 6-MP arm reproduces the textbook curve") {
    // Freireich et al. 1963, the canonical KM example: 9 relapses,
    // 12 censored. S(6)=.857143, S(7)=.806723, S(10)=.752941, ...
    val ev = Seq(6L, 6L, 6L, 7L, 10L, 13L, 16L, 22L, 23L).map((_, 1))
    val cn = Seq(6L, 9L, 10L, 11L, 17L, 19L, 20L, 25L, 32L, 32L, 34L, 35L)
      .map((_, 0))
    val df = (ev ++ cn).toDF("t", "ev")
    val got = Survival.kaplanMeier(df, "t", "ev")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val want = replay(ev ++ cn)
    assert(got(6L) === ((21L, 3L, 1L, 0.857143)))
    assert(got(7L)._4 === 0.806723)
    assert(got(10L)._4 === 0.752941)
    assert(got(13L)._4 === want(13L))
    assert(got(23L)._4 === want(23L))
    // censor-only times keep the previous survival level
    assert(got(9L)._4 === got(7L)._4)
    // cross-check every row against the independent replay
    got.foreach { case (t, (_, _, _, s)) => assert(s === want(t), s"t=$t") }
  }

  test("everyone-at-risk fails -> survival exactly 0.0 from that time on") {
    val df = Seq((1L, 1), (1L, 1), (2L, 1), (2L, 1)).toDF("t", "ev")
    val got = Survival.kaplanMeier(df, "t", "ev")
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(got(1L) === 0.5)
    assert(got(2L) === 0.0)
  }

  test("null durations are excluded; non-1 event codes censor") {
    val df = Seq(
      (Some(3L), 1), (Some(3L), 0), (Some(3L), 2), (None, 1))
      .toDF("t", "ev")
    val rows = Survival.kaplanMeier(df, "t", "ev").collect()
    assert(rows.length === 1)
    assert(rows.head.getLong(1) === 3L) // n_risk excludes the null row
    assert(rows.head.getLong(2) === 1L) // only ev=1 counts as an event
    assert(rows.head.getLong(3) === 2L) // 0 and 2 both censor
  }
}
