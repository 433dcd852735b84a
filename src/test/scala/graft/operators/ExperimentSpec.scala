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

  test("permutation test: strong effect -> minimal p; null effect -> large p") {
    def r6(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // separated groups: no re-randomization of 20 units reproduces
    // |diff| = 10 short of an all-or-nothing coin run (P ~ 2e-6)
    val strong = (0 until 10).map(i => (i.toLong, "a", 10.0)) ++
      (10 until 20).map(i => (i.toLong, "b", 0.0))
    val rs = Experiment.permutationTest(
      strong.toDF("uid", "variant", "y"), "uid", "variant", "y",
      nPerms = 100, seed = "s1").head()
    assert(rs.getAs[Long]("n_valid") === 100L)
    assert(rs.getAs[Double]("observed_diff") === 10.0)
    assert(rs.getAs[Long]("n_extreme") === 0L)
    assert(rs.getAs[Double]("p_value") === r6(1.0 / 101))
    // null effect: metric independent of the variant -> clearly not
    // significant (seeded, so the exact value is stable run to run)
    val nil = (0 until 40).map(i => (i.toLong, if (i % 2 == 0) "a" else "b",
      (i % 5).toDouble))
    val rn = Experiment.permutationTest(
      nil.toDF("uid", "variant", "y"), "uid", "variant", "y",
      nPerms = 100, seed = "s1").head()
    assert(rn.getAs[Double]("p_value") > 0.1)
    // deterministic: identical seeds, identical readout
    val rn2 = Experiment.permutationTest(
      nil.toDF("uid", "variant", "y"), "uid", "variant", "y",
      nPerms = 100, seed = "s1").head()
    assert(rn2 === rn)
  }

  test("not exactly two variants fails loudly") {
    val three = Seq(("a", 1.0, 1.0), ("b", 1.0, 1.0), ("c", 1.0, 1.0))
    intercept[IllegalArgumentException](Experiment.cuped(
      three.toDF("variant", "x", "y"), "variant", "y", "x"))
    val one = Seq(("a", 1.0, 1.0))
    intercept[IllegalArgumentException](Experiment.cuped(
      one.toDF("variant", "x", "y"), "variant", "y", "x"))
  }

  test("dirty rows (null variant/metric/covariate) are excluded coherently") {
    val clean = Seq(
      ("a", 1.0, 2.5), ("a", 2.0, 3.25), ("a", 3.0, 4.5),
      ("b", 1.5, 3.0), ("b", 2.5, 4.75), ("b", 0.5, 1.25))
    val dirty = Seq(
      (null.asInstanceOf[String], java.lang.Double.valueOf(9.0),
        java.lang.Double.valueOf(9.0)),
      ("a", null.asInstanceOf[java.lang.Double], java.lang.Double.valueOf(7.0)),
      ("b", java.lang.Double.valueOf(7.0), null.asInstanceOf[java.lang.Double]))
    val mixed = clean.map { case (v, x, y) =>
      (v, java.lang.Double.valueOf(x), java.lang.Double.valueOf(y))
    } ++ dirty
    val got = Experiment.cuped(
      mixed.toDF("variant", "x", "y"), "variant", "y", "x").head()
    val want = Experiment.cuped(
      clean.toDF("variant", "x", "y"), "variant", "y", "x").head()
    // n counts only the surviving rows (n = n_a + n_b) and every readout
    // equals the clean-input run — dirty rows neither skew nor count
    assert(got.getAs[Long]("n") === 6L)
    assert(got.getAs[Long]("n_a") + got.getAs[Long]("n_b") === got.getAs[Long]("n"))
    for (c <- Seq("diff", "theta", "adj_diff", "var_reduction"))
      assert(got.getAs[Double](c) === want.getAs[Double](c), c)
  }
}
