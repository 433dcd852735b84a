package graft.operators

import graft.SparkSpec

class ExperimentSpec extends SparkSpec {
  import spark.implicits._

  private def replay(rows: Seq[(String, Double, Double)]): Map[String, Double] = {
    // the operator's exact algebra in plain Scala: decimal quantization is
    // a no-op for these sub-cent inputs
    val n = rows.size.toDouble
    val xs = rows.map(_._2); val ys = rows.map(_._3)
    val sx = xs.sum; val sy = ys.sum
    val sxy = rows.map(r => r._2 * r._3).sum
    val sxx = xs.map(v => v * v).sum; val syy = ys.map(v => v * v).sum
    val a = rows.filter(_._1 == "a"); val b = rows.filter(_._1 == "b")
    val theta =
      if (xs.distinct.size > 1) (n * sxy - sx * sy) / (n * sxx - sx * sx) else 0.0
    val mya = a.map(_._3).sum / a.size; val myb = b.map(_._3).sum / b.size
    val mxa = a.map(_._2).sum / a.size; val mxb = b.map(_._2).sum / b.size
    def r6(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    Map(
      "diff" -> r6(mya - myb),
      "theta" -> r6(theta),
      "adj_diff" -> r6(mya - myb - theta * (mxa - mxb)),
      "var_reduction" -> r6(
        if (xs.distinct.size > 1 && ys.distinct.size > 1)
          math.pow(n * sxy - sx * sy, 2) /
            ((n * sxx - sx * sx) * (n * syy - sy * sy))
        else 0.0))
  }

  test("cuped matches an independent replay of the moment algebra") {
    val rows = Seq(
      ("a", 1.0, 2.5), ("a", 2.0, 3.25), ("a", 3.0, 4.5),
      ("b", 1.5, 3.0), ("b", 2.5, 4.75), ("b", 0.5, 1.25))
    val got = Experiment.cuped(
      rows.toDF("variant", "x", "y"), "variant", "y", "x").head()
    val want = replay(rows)
    assert(got.getAs[Long]("n") === 6L)
    assert(got.getAs[Long]("n_a") === 3L && got.getAs[Long]("n_b") === 3L)
    assert(got.getAs[String]("variant_a") === "a")
    assert(got.getAs[Double]("diff") === want("diff"))
    assert(got.getAs[Double]("theta") === want("theta"))
    assert(got.getAs[Double]("adj_diff") === want("adj_diff"))
    assert(got.getAs[Double]("var_reduction") === want("var_reduction"))
    // correlated covariate must actually reduce variance here
    assert(got.getAs[Double]("var_reduction") > 0.5)
  }

  test("within-group y = x + offset: theta = 1, pooled rho2 = 0.8 exactly") {
    // y = x + group offset with BALANCED x across groups: theta = 1 and
    // the adjustment recovers the pure group effect; the group offset
    // keeps POOLED correlation below 1 (rho2 = 16/(4*5) = 0.8 by hand)
    val rows = Seq(
      ("a", 1.0, 2.0), ("a", 2.0, 3.0), ("b", 1.0, 1.5), ("b", 2.0, 2.5))
    val got = Experiment.cuped(
      rows.toDF("variant", "x", "y"), "variant", "y", "x").head()
    assert(got.getAs[Double]("theta") === 1.0)
    assert(got.getAs[Double]("var_reduction") === 0.8)
    assert(got.getAs[Double]("adj_diff") === 0.5)
    assert(got.getAs[Double]("diff") === 0.5)
  }

  test("constant covariate degrades to the raw diff: theta 0, reduction 0") {
    val rows = Seq(("a", 5.0, 2.0), ("a", 5.0, 4.0), ("b", 5.0, 1.0))
    val got = Experiment.cuped(
      rows.toDF("variant", "x", "y"), "variant", "y", "x").head()
    assert(got.getAs[Double]("theta") === 0.0)
    assert(got.getAs[Double]("var_reduction") === 0.0)
    assert(got.getAs[Double]("adj_diff") === got.getAs[Double]("diff"))
  }

  test("not exactly two variants fails loudly") {
    val three = Seq(("a", 1.0, 1.0), ("b", 1.0, 1.0), ("c", 1.0, 1.0))
    intercept[IllegalArgumentException](Experiment.cuped(
      three.toDF("variant", "x", "y"), "variant", "y", "x"))
    val one = Seq(("a", 1.0, 1.0))
    intercept[IllegalArgumentException](Experiment.cuped(
      one.toDF("variant", "x", "y"), "variant", "y", "x"))
  }
}
