package graft.operators

import graft.SparkSpec

class RidgeRegressionSpec extends SparkSpec {

  private def fit(rows: Seq[(Double, Double, Double)], lambda: Double = 0.0) = {
    val s = spark
    import s.implicits._
    RidgeRegression.ridge2(rows.toDF("y", "x1", "x2"), "y", "x1", "x2", lambda)
      .collect().head
  }

  test("noiseless plane recovered exactly at lambda=0") {
    val rows = for (i <- 0 until 20; j <- 0 until 3) yield {
      val (x1, x2) = (i.toDouble, (i * 7 % 11 + j).toDouble)
      (3.0 + 2.0 * x1 - 0.5 * x2, x1, x2)
    }
    val r = fit(rows)
    assert(r.getAs[Double]("b0") == 3.0)
    assert(r.getAs[Double]("b1") == 2.0)
    assert(r.getAs[Double]("b2") == -0.5)
    assert(r.getAs[Double]("r2") == 1.0)
  }

  test("ridge shrinks coefficients monotonically toward zero") {
    val rows = (0 until 50).map { i =>
      val x1 = i.toDouble
      val x2 = (i % 7).toDouble
      (1.0 + 4.0 * x1 + 2.0 * x2 + (if (i % 2 == 0) 0.25 else -0.25), x1, x2)
    }
    val b1s = Seq(0.0, 10.0, 1000.0).map(l => math.abs(fit(rows, l).getAs[Double]("b1")))
    assert(b1s(0) > b1s(1) && b1s(1) > b1s(2))
  }

  test("singular design (constant feature, lambda=0) yields NULLs, not garbage") {
    val rows = (0 until 10).map(i => (i * 2.0, i.toDouble, 5.0))
    val r = fit(rows)
    assert(r.isNullAt(r.fieldIndex("b0")))
    // ...and a tiny ridge regularizes it back to a solvable system
    val r2 = fit(rows, lambda = 0.001)
    assert(!r2.isNullAt(r2.fieldIndex("b1")))
    assert(math.abs(r2.getAs[Double]("b1") - 2.0) < 0.01)
  }

  test("partition-order-proof: exact-decimal moments at 1 vs 16 partitions") {
    val s = spark
    import s.implicits._
    val rows = (0 until 500).map { i =>
      (math.sin(i) * 100, i % 37 + 0.25, (i * i % 91).toDouble)
    }
    val df = rows.toDF("y", "x1", "x2")
    val a = RidgeRegression.ridge2(df.repartition(1), "y", "x1", "x2", 0.5)
      .collect().head.toSeq
    val b = RidgeRegression.ridge2(df.repartition(16), "y", "x1", "x2", 0.5)
      .collect().head.toSeq
    assert(a == b)
  }

  test("null rows excluded from the fit") {
    val s = spark
    import s.implicits._
    val clean = (0 until 12).map(i => (Some(1.0 + 2.0 * i), Some(i.toDouble), Some(0.5 * i)))
    val dirty = clean ++ Seq((None, Some(1.0), Some(1.0)), (Some(9.0), None, Some(1.0)))
    val r = dirty.toDF("y", "x1", "x2")
    val out = RidgeRegression.ridge2(r, "y", "x1", "x2").collect().head
    assert(out.getAs[Long]("n_rows") == 12L)
  }
}
