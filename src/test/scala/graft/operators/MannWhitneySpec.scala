package graft.operators

import graft.SparkSpec

class MannWhitneySpec extends SparkSpec {

  private def test2(rows: Seq[(String, Double)]) = {
    val s = spark
    import s.implicits._
    MannWhitney.uTest(rows.toDF("g", "v"), "g", "v", "a", "b")
      .collect().head
  }

  test("textbook no-tie case matches the hand computation") {
    // a: 1,3,5  b: 2,4,6 → ranks a: 1,3,5 (R1=9), U1 = 9 - 6 = 3
    val r = test2(Seq(("a", 1.0), ("a", 3.0), ("a", 5.0),
      ("b", 2.0), ("b", 4.0), ("b", 6.0)))
    assert(r.getAs[Double]("u_a") == 3.0)
    assert(r.getAs[Double]("u_b") == 6.0)
    // mean 4.5, sigma^2 = 3*3/12 * (7 - 0/30)= 5.25; z=(3-4.5)/sqrt(5.25)
    val z = BigDecimal(-1.5 / math.sqrt(5.25))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("z") == z)
  }

  test("ties get exact midranks and the tie-corrected variance") {
    // a: 1,2,2  b: 2,3 → value 2 has t=3, midrank (2+(3+1)/2)=... below(2)=1
    // midranks: 1→1, 2→1+(3+1)/2=3, 3→4+... below(3)=4 → 4+(1+1)/2=5
    // R1 = 1 + 3 + 3 = 7; U1 = 7 - 6 = 1
    val r = test2(Seq(("a", 1.0), ("a", 2.0), ("a", 2.0),
      ("b", 2.0), ("b", 3.0)))
    assert(r.getAs[Double]("u_a") == 1.0)
    // U1+U2 = n1*n2
    assert(r.getAs[Double]("u_b") == 5.0)
    // tcorr = 3^3-3 = 24; sigma^2 = 6/12 * (6 - 24/20) = 2.4
    val z = BigDecimal((1.0 - 3.0) / math.sqrt(2.4))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("z") == z)
  }

  test("all values tied: variance 0, z NULL, U still defined") {
    val r = test2(Seq(("a", 5.0), ("a", 5.0), ("b", 5.0)))
    assert(r.isNullAt(r.fieldIndex("z")))
    // midrank of 5 = 2 → R1 = 4 → U1 = 4 - 3 = 1 = n1*n2/2
    assert(r.getAs[Double]("u_a") == 1.0)
  }

  test("stochastic dominance drives z strongly negative") {
    val rows = (1 to 50).map(i => ("a", i.toDouble)) ++
      (1 to 50).map(i => ("b", i + 100.0))
    val r = test2(rows)
    assert(r.getAs[Double]("z") < -8.0)
    assert(r.getAs[Double]("u_a") == 0.0)
  }

  test("partition-order-proof") {
    val s = spark
    import s.implicits._
    val rows = (1 to 200).map(i => (if (i % 3 == 0) "a" else "b", (i % 17).toDouble))
    val df = rows.toDF("g", "v")
    val one = MannWhitney.uTest(df.repartition(1), "g", "v", "a", "b").collect().head.toSeq
    val many = MannWhitney.uTest(df.repartition(16), "g", "v", "a", "b").collect().head.toSeq
    assert(one == many)
  }

  test("other groups are ignored") {
    val r = test2(Seq(("a", 1.0), ("b", 2.0), ("c", 99.0), ("zz", -5.0)))
    assert(r.getAs[Long]("n_a") == 1L && r.getAs[Long]("n_b") == 1L)
  }
}
