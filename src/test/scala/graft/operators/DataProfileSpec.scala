package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DataProfileSpec extends SparkSpec {

  test("histogram exact percentiles equal the built-in percentile aggregate") {
    import spark.implicits._
    // duplicates, skew, and sizes that exercise both integral and
    // fractional interpolation ranks
    val data = (1 to 997).map(i => ((i * 37) % 251) + (i % 3) * 0.25) ++
      Seq.fill(50)(42.0) ++ Seq(0.01, 9999.5)
    val df = data.toDF("v")
    val ps = Seq("p05" -> 0.05, "p25" -> 0.25, "p50" -> 0.5, "p95" -> 0.95)
    val got = DataProfile.exactPercentiles(df, "v", ps).head()
    val want = df.agg(
      expr("percentile(v, 0.05)"), expr("percentile(v, 0.25)"),
      expr("percentile(v, 0.5)"), expr("percentile(v, 0.95)")).head()
    assert(got.getLong(0) === data.size.toLong)
    ps.indices.foreach { i =>
      assert(math.abs(got.getDouble(i + 1) - want.getDouble(i)) < 1e-9,
        s"${ps(i)._1}: got ${got.getDouble(i + 1)} want ${want.getDouble(i)}")
    }
  }

  test("null values are ignored, matching the built-in") {
    import spark.implicits._
    val df = Seq[java.lang.Double](1.0, null, 2.0, 3.0, null, 4.0).toDF("v")
    val got = DataProfile.exactPercentiles(df, "v", Seq("med" -> 0.5)).head()
    assert(got.getLong(0) === 4L)
    assert(got.getDouble(1) === 2.5)
  }

  test("contingencyStats: hand-computed 2x2 chi-square and MI terms") {
    import spark.implicits._
    // counts: (a,p)=30 (a,q)=10 (b,p)=10 (b,q)=50; n=100
    val rows =
      Seq.fill(30)(("a", "p")) ++ Seq.fill(10)(("a", "q")) ++
        Seq.fill(10)(("b", "p")) ++ Seq.fill(50)(("b", "q"))
    val got = DataProfile.contingencyStats(rows.toDF("x", "y"), "x", "y")
      .orderBy("x", "y").collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    // margins: na=40 nb=60 np=40 nq=60
    val (obsAp, eAp, chiAp, miAp) = got(("a", "p"))
    assert(obsAp === 30L)
    assert(eAp === 16.0) // 40*40/100
    assert(math.abs(chiAp - (30.0 - 16.0) * (30.0 - 16.0) / 16.0) < 1e-12)
    assert(math.abs(miAp - 0.30 * math.log(30.0 * 100 / (40.0 * 40))) < 1e-12)
    // chi2 terms sum to the full statistic; independent table → all ~0
    val chi2 = got.values.map(_._3).sum
    assert(math.abs(chi2 - (196.0 / 16 + 196.0 / 24 + 196.0 / 24 + 196.0 / 36)) < 1e-9)
    val indep = Seq.fill(20)(("a", "p")) ++ Seq.fill(20)(("a", "q")) ++
      Seq.fill(30)(("b", "p")) ++ Seq.fill(30)(("b", "q"))
    val flat = DataProfile.contingencyStats(indep.toDF("x", "y"), "x", "y")
      .collect().map(r => (r.getDouble(4), r.getDouble(5)))
    assert(flat.forall { case (c, m) => math.abs(c) < 1e-12 && math.abs(m) < 1e-12 })
  }

  test("mutualInformation: hand-computed 2x2 entropies, MI, NMI") {
    import spark.implicits._
    // counts: (a,p)=30 (a,q)=10 (b,p)=10 (b,q)=50; n=100
    val rows =
      Seq.fill(30)(("a", "p")) ++ Seq.fill(10)(("a", "q")) ++
        Seq.fill(10)(("b", "p")) ++ Seq.fill(50)(("b", "q"))
    val r = DataProfile.mutualInformation(rows.toDF("x", "y"), "x", "y").head()
    def h(ps: Double*): Double = -ps.map(p => p * math.log(p)).sum
    val hx = h(0.4, 0.6); val hy = h(0.4, 0.6)
    val hxy = h(0.3, 0.1, 0.1, 0.5)
    assert(r.getLong(0) === 100L && r.getLong(1) === 2L && r.getLong(2) === 2L)
    assert(math.abs(r.getDouble(3) - hx) < 1e-12)
    assert(math.abs(r.getDouble(4) - hy) < 1e-12)
    assert(math.abs(r.getDouble(5) - hxy) < 1e-12)
    assert(math.abs(r.getDouble(6) - (hx + hy - hxy)) < 1e-12)
    assert(math.abs(r.getDouble(7) - (hxy - hx)) < 1e-12)
    assert(math.abs(r.getDouble(8) - (hx + hy - hxy) / math.sqrt(hx * hy)) < 1e-12)
    // independent table → MI ~ 0, H(Y|X) = H(Y)
    val indep = Seq.fill(20)(("a", "p")) ++ Seq.fill(20)(("a", "q")) ++
      Seq.fill(30)(("b", "p")) ++ Seq.fill(30)(("b", "q"))
    val ri = DataProfile.mutualInformation(indep.toDF("x", "y"), "x", "y").head()
    assert(math.abs(ri.getDouble(6)) < 1e-12)
    assert(math.abs(ri.getDouble(7) - h(0.5, 0.5)) < 1e-12)
    // degenerate: constant X → H(X)=0, NMI NULL, MI 0
    val const = Seq.fill(7)(("only", "p")) ++ Seq.fill(3)(("only", "q"))
    val rc = DataProfile.mutualInformation(const.toDF("x", "y"), "x", "y").head()
    assert(math.abs(rc.getDouble(3)) < 1e-12)
    assert(math.abs(rc.getDouble(6)) < 1e-12)
    assert(rc.isNullAt(8))
  }

  test("ksTwoSample: hand-computed D and location; exact fractions") {
    import spark.implicits._
    val rows = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 3.0), ("b", 4.0))
    val got = DataProfile.ksTwoSample(rows.toDF("g", "v"), "v", "g", "a", "b").collect()(0)
    // CDFs at 1,2,3,4: a = 1/3,2/3,1,1; b = 0,0,1/2,1 → D = 2/3 at v=2
    assert(got.getLong(0) === 3L && got.getLong(1) === 2L)
    assert(got.getDouble(2) === 2.0 / 3.0, "exact integer-ratio arithmetic, no tolerance")
    assert(got.getDouble(3) === 2.0)
  }

  test("ksTwoSample: supremum ties resolve to the smallest value") {
    import spark.implicits._
    val rows = Seq(("a", 1.0), ("a", 2.0), ("b", 2.0), ("b", 3.0))
    val got = DataProfile.ksTwoSample(rows.toDF("g", "v"), "v", "g", "a", "b").collect()(0)
    // d = 1/2 at v=1 AND v=2; tie → 1
    assert(got.getDouble(2) === 0.5 && got.getDouble(3) === 1.0)
  }

  test("cramersV: perfect association = 1; independence = 0; degenerate table NULL") {
    import spark.implicits._
    // perfect 2x2 association: chi2 = n·min(r-1,c-1) → V = 1
    val perfect = (Seq.fill(5)(("a", "1")) ++ Seq.fill(5)(("b", "2"))).toDF("x", "y")
    val p = DataProfile.cramersV(perfect, "x", "y").collect()(0)
    assert(p.getLong(0) === 10 && p.getLong(3) === 1)
    assert(math.abs(p.getDouble(5) - 1.0) < 1e-12)
    // exact independence: every (x, y) cell equally filled → chi2 = 0 → V = 0
    val indep = (for { x <- Seq("a", "b"); y <- Seq("1", "2"); _ <- 1 to 3 }
      yield (x, y)).toDF("x", "y")
    val i = DataProfile.cramersV(indep, "x", "y").collect()(0)
    assert(math.abs(i.getDouble(4)) < 1e-12 && math.abs(i.getDouble(5)) < 1e-12)
    // one-category dimension: min(r-1, c-1) = 0 → V undefined, never ±inf
    val degen = Seq(("a", "1"), ("b", "1"), ("a", "1")).toDF("x", "y")
    val d = DataProfile.cramersV(degen, "x", "y").collect()(0)
    assert(d.getLong(3) === 0 && d.isNullAt(5))
  }

  test("keySkewReport: hand-computed shares and Gini; uniform → 0; nulls excluded") {
    import spark.implicits._
    // counts: a=1, b=2, c=5 (asc order a,b,c → i = 1,2,3)
    // G = 2·(1·1 + 2·2 + 3·5)/(3·8) − 4/3 = 40/24 − 4/3 = 1/3
    val rows = (Seq.fill(1)("a") ++ Seq.fill(2)("b") ++ Seq.fill(5)("c") ++
      Seq.fill(3)(null.asInstanceOf[String])).toDF("k")
    val r = DataProfile.keySkewReport(rows, "k").head()
    assert(r.getLong(0) === 8L && r.getLong(1) === 3L && r.getLong(2) === 5L)
    assert(r.getDouble(3) === 5.0 / 8 && r.getDouble(4) === 1.0)
    assert(math.abs(r.getDouble(5) - 1.0 / 3) < 1e-12)
    // perfectly uniform keys → Gini 0
    val uni = (1 to 4).flatMap(i => Seq.fill(3)(s"k$i")).toDF("k")
    val u = DataProfile.keySkewReport(uni, "k").head()
    assert(u.getLong(1) === 4L && math.abs(u.getDouble(5)) < 1e-12)
    // extreme skew: 1 row each on 9 keys + 991 on one → Gini near 1
    val skew = ((1 to 9).map(i => s"s$i") ++ Seq.fill(991)("hot")).toDF("k")
    val sk = DataProfile.keySkewReport(skew, "k").head()
    assert(sk.getLong(2) === 991L && sk.getDouble(3) === 0.991)
    assert(sk.getDouble(5) > 0.85)
  }

  test("jackknifeMeanCI: hand-computed two-fold case; null values excluded") {
    import spark.implicits._
    // fold 0 (ids 0,2): values 1,3 ; fold 1 (id 1): value 5
    // mean = 3; LOO means θ = (5, 2); θ̄ = 3.5; Σ(θ−θ̄)² = 4.5
    // SE = sqrt((2−1)/2 · 4.5) = 1.5
    val rows = Seq((0L, Some(1.0)), (1L, Some(5.0)), (2L, Some(3.0)),
      (3L, None)).toDF("id", "v")
    val r = DataProfile.jackknifeMeanCI(rows, "v", "id", folds = 2).head()
    assert(r.getLong(0) === 3L)
    assert(r.getDouble(1) === 3.0)
    assert(math.abs(r.getDouble(2) - 1.5) < 1e-12)
    assert(math.abs(r.getDouble(3) - (3.0 - 1.96 * 1.5)) < 1e-12)
    assert(math.abs(r.getDouble(4) - (3.0 + 1.96 * 1.5)) < 1e-12)
  }

  test("ksTwoSample: identical samples give D = 0; other groups ignored") {
    import spark.implicits._
    val rows = Seq(("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0),
      ("z", 99.0), ("z", -99.0))
    val got = DataProfile.ksTwoSample(rows.toDF("g", "v"), "v", "g", "a", "b").collect()(0)
    assert(got.getDouble(2) === 0.0)
    assert(got.getLong(0) === 2L && got.getLong(1) === 2L, "group z never enters")
  }
}
