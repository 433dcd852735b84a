package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DtwSpec extends SparkSpec {

  /** Driver-side reference DTW, the textbook O(n·m) recursion. */
  private def refDtw(ys: Seq[Double], p: Seq[Double]): Double = {
    val inf = 1e300
    var prev = 0.0 +: Seq.fill(p.size)(inf)
    ys.foreach { y =>
      var cur = Vector(inf)
      (1 to p.size).foreach { j =>
        cur = cur :+ (math.abs(y - p(j - 1)) +
          math.min(math.min(prev(j - 1), prev(j)), cur(j - 1)))
      }
      prev = cur
    }
    prev(p.size)
  }

  private def dtw(rows: Seq[(String, Long, Double)], p: Seq[Double]) = {
    val s = spark
    import s.implicits._
    TimeSeries.dtwToPattern(rows.toDF("k", "t", "y"), "k", "t", "y", p)
      .collect().map(r => r.getAs[String]("k") -> r).toMap
  }

  test("exact match: pattern played verbatim scores 0") {
    val p = Seq(1.0, 5.0, 2.0, 8.0)
    val out = dtw(p.zipWithIndex.map { case (y, i) => ("a", i.toLong, y) }, p)
    assert(out("a").getAs[Double]("dtw_distance") == 0.0)
  }

  test("elastic: time-stretched pattern still scores 0") {
    val p = Seq(1.0, 2.0, 3.0)
    val stretched = Seq(1.0, 1.0, 2.0, 2.0, 2.0, 3.0, 3.0)
    val out = dtw(stretched.zipWithIndex.map { case (y, i) => ("a", i.toLong, y) }, p)
    assert(out("a").getAs[Double]("dtw_distance") == 0.0)
  }

  test("hand-checked 2x2 lattice") {
    // series [0, 2], pattern [1, 1]:
    // D(1,1)=1, D(1,2)=1+1=2; D(2,1)=1+1=2, D(2,2)=1+min(2,2,1)=2
    val out = dtw(Seq(("a", 0L, 0.0), ("a", 1L, 2.0)), Seq(1.0, 1.0))
    assert(out("a").getAs[Double]("dtw_distance") == 2.0)
  }

  test("matches the driver-side reference recursion on irregular series") {
    val p = Seq(10.0, 20.0, 30.0, 20.0, 10.0)
    val ys = Seq(3.4, 11.0, 19.5, 31.2, 28.0, 14.1, 9.9, 5.0, 22.2, 30.0)
    val out = dtw(ys.zipWithIndex.map { case (y, i) => ("a", i.toLong, y) }, p)
    val expected = BigDecimal(refDtw(ys, p))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out("a").getAs[Double]("dtw_distance") == expected)
  }

  test("input row order and partitioning are irrelevant (sort_array discipline)") {
    val p = Seq(2.0, 4.0)
    val rows = Seq(("a", 3L, 9.0), ("a", 0L, 1.0), ("a", 2L, 4.0), ("a", 1L, 2.0),
      ("b", 1L, 7.0), ("b", 0L, 2.0))
    val s = spark
    import s.implicits._
    val df = rows.toDF("k", "t", "y")
    val one = TimeSeries.dtwToPattern(df.repartition(1), "k", "t", "y", p)
      .orderBy("k").collect().map(_.toSeq).toSeq
    val eight = TimeSeries.dtwToPattern(df.repartition(8), "k", "t", "y", p)
      .orderBy("k").collect().map(_.toSeq).toSeq
    assert(one == eight)
    val sortedRef = refDtw(Seq(1.0, 2.0, 4.0, 9.0), p)
    assert(one.head(2) ==
      BigDecimal(sortedRef).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("single-point series: distance is the path through the whole pattern") {
    val p = Seq(1.0, 2.0, 3.0)
    val out = dtw(Seq(("a", 0L, 2.0)), p)
    // one series point aligned to all three pattern points: 1+0+1
    assert(out("a").getAs[Double]("dtw_distance") == 2.0)
    assert(out("a").getAs[Int]("n_points") == 1)
  }
}
