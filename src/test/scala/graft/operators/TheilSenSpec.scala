package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TheilSenSpec extends SparkSpec {

  private def series(rows: Seq[(String, Long, Double)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("k", "x", "y")
  }

  private def ts(df: org.apache.spark.sql.DataFrame) =
    TimeSeries.theilSenSlope(df, "k", "x", "y")
      .collect().map(r => r.getAs[String]("k") -> r).toMap

  test("exact line recovered: slope and intercept of y = 2x + 3") {
    val out = ts(series((0L to 9L).map(i => ("a", i, 2.0 * i + 3.0))))
    assert(out("a").getAs[Double]("ts_slope") == 2.0)
    assert(out("a").getAs[Double]("ts_intercept") == 3.0)
    assert(out("a").getAs[Long]("n_pairs") == 45L)
  }

  test("robust to a planted 1000x outlier where OLS is not") {
    val clean = (0L to 9L).map(i => ("a", i, 2.0 * i + 3.0))
    val spiked = clean.updated(5, ("a", 5L, 5000.0))
    val df = series(spiked)
    val out = ts(df)
    // Theil-Sen: median pairwise slope still 2 (majority of pairs avoid idx 5)
    assert(math.abs(out("a").getAs[Double]("ts_slope") - 2.0) < 0.01)
    val ols = TimeSeries.trendSlope(df, "k", "x", "y").collect().head
    assert(math.abs(ols.getAs[Double]("slope") - 2.0) > 10.0) // OLS dragged
  }

  test("constant series: slope exactly 0, intercept the constant") {
    val out = ts(series((0L to 5L).map(i => ("c", i, 7.5))))
    assert(out("c").getAs[Double]("ts_slope") == 0.0)
    assert(out("c").getAs[Double]("ts_intercept") == 7.5)
  }

  test("single point: NULL slope, 0 pairs; two points: the single pair slope") {
    val out = ts(series(Seq(("one", 4L, 9.0), ("two", 0L, 1.0), ("two", 2L, 5.0))))
    assert(out("one").isNullAt(out("one").fieldIndex("ts_slope")))
    assert(out("one").getAs[Long]("n_pairs") == 0L)
    assert(out("two").getAs[Double]("ts_slope") == 2.0)
    assert(out("two").getAs[Long]("n_pairs") == 1L)
  }

  test("equal-x pairs excluded (no infinite slopes)") {
    val out = ts(series(Seq(("d", 0L, 1.0), ("d", 0L, 100.0), ("d", 1L, 2.0))))
    // pairs: (0,1) twice — slopes 1 and -98; the (0,0) pair is excluded
    assert(out("d").getAs[Long]("n_pairs") == 2L)
  }

  test("partition-order-proof: identical at 1 and 8 partitions") {
    val base = (0L to 29L).map(i => ("p", i, math.sin(i * 0.7) * 10 + i * 1.3))
    val df = series(base ++ (0L to 19L).map(i => ("q", i * 3, i * -0.5 + 40)))
    val a = TimeSeries.theilSenSlope(df.repartition(1), "k", "x", "y")
      .orderBy("k").collect().toSeq.map(_.toSeq)
    val b = TimeSeries.theilSenSlope(df.repartition(8), "k", "x", "y")
      .orderBy("k").collect().toSeq.map(_.toSeq)
    assert(a == b)
  }
}
