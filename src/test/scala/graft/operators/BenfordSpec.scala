package graft.operators

import graft.SparkSpec

class BenfordSpec extends SparkSpec {
  import spark.implicits._

  test("digit extraction is boundary-proof; counts/shares/chi2 match hand math") {
    // 10 positive values incl. exact powers of ten (the libm boundary),
    // sub-1 values, and excluded null/zero/negative rows
    val vals = Seq(
      Some(1000.0), Some(999.99), Some(1.0), Some(0.02), Some(0.5),
      Some(123.0), Some(19.0), Some(2000.0), Some(31.0), Some(95.0),
      None, Some(0.0), Some(-500.0))
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "x")
    val got = DataProfile.benfordReport(df, "x")
      .collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    // digits: 1000→1, 999.99→9, 1→1, 0.02→2, 0.5→5, 123→1, 19→1,
    // 2000→2, 31→3, 95→9  (N=10)
    val wantCounts = Map(1 -> 4L, 2 -> 2L, 3 -> 1L, 5 -> 1L, 9 -> 2L)
    assert(got.view.mapValues(_._1).toMap === wantCounts)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    wantCounts.foreach { case (d, n) =>
      val p = math.log(1.0 + 1.0 / d) / math.log(10.0)
      val exp = 10.0 * p
      assert(got(d)._2 === r6(n / 10.0))
      assert(got(d)._3 === r6(p))
      assert(math.abs(got(d)._4 - (n - exp) * (n - exp) / exp) < 2e-6, s"digit $d")
    }
  }

  test("non-finite values are excluded: +Inf neither faults nor adds a digit row") {
    val df = Seq(
      (1L, Some(Double.PositiveInfinity)), (2L, Some(Double.NaN)),
      (3L, Some(123.0)), (4L, Some(95.0)), (5L, None)).toDF("id", "x")
    val got = DataProfile.benfordReport(df, "x")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got === Map(1 -> 1L, 9 -> 1L))
  }

  test("a Benford-conforming geometric column yields small chi2; uniform-first-digit does not") {
    // powers of a constant ratio are the canonical Benford generator
    val benford = (0 until 300).map(i => (i.toLong, math.pow(1.1, i))).toDF("id", "x")
    val chiB = DataProfile.benfordReport(benford, "x")
      .agg(org.apache.spark.sql.functions.sum("chi2_contrib")).head().getDouble(0)
    val uniform = (0 until 300).map(i => (i.toLong, (i % 9 + 1) * 100.0)).toDF("id", "x")
    val chiU = DataProfile.benfordReport(uniform, "x")
      .agg(org.apache.spark.sql.functions.sum("chi2_contrib")).head().getDouble(0)
    assert(chiB < 16.0, s"geometric series should conform, chi2=$chiB")
    assert(chiU > 50.0, s"uniform digits should reject, chi2=$chiU")
  }
}
