package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AgreementSpec extends SparkSpec {
  import spark.implicits._

  test("cohen kappa: the classic 2x2 textbook table gives 0.4 exactly") {
    // 20 yes/yes, 5 yes/no, 10 no/yes, 15 no/no:
    // po = 35/50 = .7, pe = (25*30 + 25*20)/2500 = .5, kappa = .4
    val rows =
      Seq.fill(20)(("y", "y")) ++ Seq.fill(5)(("y", "n")) ++
        Seq.fill(10)(("n", "y")) ++ Seq.fill(15)(("n", "n"))
    val got = Agreement.cohenKappa(rows.toDF("a", "b"), "a", "b").head()
    assert(got.getLong(0) === 50L)
    assert(got.getDouble(1) === 0.7)
    assert(got.getDouble(2) === 0.5)
    assert(got.getDouble(3) === 0.4)
  }

  test("cohen kappa: perfect, chance-level, and degenerate agreement") {
    val perfect = Seq(("a", "a"), ("b", "b"), ("c", "c"), ("a", "a"))
    assert(Agreement.cohenKappa(perfect.toDF("a", "b"), "a", "b")
      .head().getDouble(3) === 1.0)
    // independent raters at uniform 2 labels over a balanced table → κ=0
    val chance = Seq(("a", "a"), ("a", "b"), ("b", "a"), ("b", "b"))
    assert(Agreement.cohenKappa(chance.toDF("a", "b"), "a", "b")
      .head().getDouble(3) === 0.0)
    // both raters constant and equal: pe = 1 → NULL, not 1.0
    val const = Seq(("x", "x"), ("x", "x"))
    assert(Agreement.cohenKappa(const.toDF("a", "b"), "a", "b")
      .head().isNullAt(3))
    // null labels drop before counting
    val withNulls = Seq(("a", "a"), (null, "b"), ("b", null), ("b", "b"))
    assert(Agreement.cohenKappa(withNulls.toDF("a", "b"), "a", "b")
      .head().getLong(0) === 2L)
  }

  test("fleiss kappa: hand-computed pool, perfect pool, unequal-n fails loud") {
    // 4 items, 3 raters: item 1 all A (P=1), item 2 all B (P=1),
    // item 3 A,A,B (P = (4+1-3)/6 = 1/3), item 4 A,B,B (1/3)
    // P̄ = (1+1+1/3+1/3)/4 = 2/3; pⱼ: A 6/12, B 6/12 → P̄ₑ = .5
    // κ = (2/3 − .5)/.5 = 1/3
    val ratings = Seq(
      (1, 1, "A"), (1, 2, "A"), (1, 3, "A"),
      (2, 1, "B"), (2, 2, "B"), (2, 3, "B"),
      (3, 1, "A"), (3, 2, "A"), (3, 3, "B"),
      (4, 1, "A"), (4, 2, "B"), (4, 3, "B")).toDF("item", "rater", "label")
    val got = Agreement.fleissKappa(ratings, "item", "rater", "label").head()
    assert(got.getLong(0) === 4L && got.getLong(1) === 3L)
    assert(got.getDouble(2) === 0.666667)
    assert(got.getDouble(3) === 0.5)
    assert(got.getDouble(4) === 0.333333)
    // all raters agree on every item → κ = 1
    val perfect = Seq(
      (1, 1, "A"), (1, 2, "A"), (2, 1, "B"), (2, 2, "B"))
      .toDF("item", "rater", "label")
    assert(Agreement.fleissKappa(perfect, "item", "rater", "label")
      .head().getDouble(4) === 1.0)
    // ragged rating counts are a caller bug, not a silent reweight
    val ragged = Seq((1, 1, "A"), (1, 2, "A"), (2, 1, "B"))
      .toDF("item", "rater", "label")
    val e = intercept[IllegalArgumentException](
      Agreement.fleissKappa(ragged, "item", "rater", "label"))
    assert(e.getMessage.contains("SAME number of ratings"))
  }

  /** Independent reference: Pearson correlation of midranks, plain
    * doubles — the definitionally-obvious form the exact-sum
    * implementation must match after rounding.
    */
  private def refSpearman(xs: Seq[Double], ys: Seq[Double]): Double = {
    def midranks(v: Seq[Double]): Seq[Double] = {
      val sorted = v.sorted
      v.map { x =>
        val lo = sorted.indexOf(x) + 1
        val hi = sorted.lastIndexOf(x) + 1
        (lo + hi) / 2.0
      }
    }
    val rx = midranks(xs); val ry = midranks(ys)
    val n = xs.size
    val mx = rx.sum / n; val my = ry.sum / n
    val cov = rx.zip(ry).map { case (a, b) => (a - mx) * (b - my) }.sum
    val vx = rx.map(a => (a - mx) * (a - mx)).sum
    val vy = ry.map(b => (b - my) * (b - my)).sum
    math.round(cov / math.sqrt(vx * vy) * 1e6) / 1e6
  }

  test("spearman rho: ties via midranks, exact doubled-rank arithmetic") {
    val xs = Seq(1.0, 2.0, 3.0, 4.0, 5.0)
    val ys = Seq(5.0, 6.0, 7.0, 8.0, 7.0)
    val got = Agreement.spearmanRho(
      xs.zip(ys).toDF("x", "y"), "x", "y").head()
    assert(got.getLong(0) === 5L)
    assert(got.getDouble(1) === refSpearman(xs, ys))
    // monotone ↑ → 1; monotone ↓ → −1 even with x-ties
    val up = Seq((1.0, 10.0), (1.0, 11.0), (2.0, 20.0), (3.0, 30.0))
    assert(Agreement.spearmanRho(up.toDF("x", "y"), "x", "y")
      .head().getDouble(1) === refSpearman(
        up.map(_._1), up.map(_._2)))
    val down = Seq((1.0, 9.0), (2.0, 7.0), (3.0, 5.0), (4.0, 1.0))
    assert(Agreement.spearmanRho(down.toDF("x", "y"), "x", "y")
      .head().getDouble(1) === -1.0)
    // constant column: undefined → NULL
    val const = Seq((1.0, 3.0), (2.0, 3.0), (3.0, 3.0))
    assert(Agreement.spearmanRho(const.toDF("x", "y"), "x", "y")
      .head().isNullAt(1))
  }

  test("spearman rho: partition-order invariance on a tie-heavy frame") {
    val base = (0 until 5000).map(i =>
      ((i * 2654435761L % 11).toDouble, (i * 40503L % 7).toDouble))
    val r1 = Agreement.spearmanRho(
      base.toDF("x", "y").repartition(1), "x", "y").head().getDouble(1)
    val r16 = Agreement.spearmanRho(
      base.toDF("x", "y").repartition(16), "x", "y").head().getDouble(1)
    assert(r1 === r16)
    assert(r1 === refSpearman(base.map(_._1), base.map(_._2)))
  }
}
