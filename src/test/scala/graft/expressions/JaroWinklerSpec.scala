package graft.expressions

import graft.SparkSpec
import graft.functions.TextAnalysis
import org.apache.spark.sql.functions.col

class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  test("kernel matches DuckDB-probed reference values") {
    // reference values probed from duckdb jaro_winkler_similarity
    val cases = Seq(
      ("martha", "marhta", 0.9611111111111111),
      ("dixon", "dicksonx", 0.8133333333333332),
      ("axxxxx", "ayyyyy", 0.4444444444444444), // below boost threshold
      ("", "", 0.0),
      ("", "a", 0.0),
      ("a", "a", 1.0),
      ("abc", "", 0.0),
      ("duane", "dwayne", 0.8400000000000001),
      ("ab", "ba", 0.0), // window 0: no cross-position matches
      ("aaapppp", "ap", 0.7857142857142857),
      // odd mismatch count: transpositions FLOOR (strcmp95), not 2.5 —
      // the case a naive t/2.0 kernel gets wrong (0.6809..)
      ("0d0fd7c6e0", "0e6c7df0d0", 0.7342857142857143))
    cases.foreach { case (a, b, want) =>
      val got = JaroWinkler.similarity(a, b)
      assert(math.abs(got - want) < 1e-12, s"($a, $b): got $got want $want")
    }
  }

  test("expression: codegen path, null propagation, symmetry") {
    val df = Seq(
      (1L, "martha", "marhta"),
      (2L, null.asInstanceOf[String], "x"),
      (3L, "spark", "spork")).toDF("id", "a", "b")
    val got = df.select(col("id"),
        TextAnalysis.jaroWinkler(col("a"), col("b")).as("jw"),
        TextAnalysis.jaroWinkler(col("b"), col("a")).as("wj"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Double]),
          Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    assert(got(1L)._1.get === 0.9611111111111111)
    assert(got(2L) === ((None, None)))
    assert(got(3L)._1 === got(3L)._2, "must be symmetric")
    assert(got(3L)._1.get > 0.8 && got(3L)._1.get < 1.0)
  }

  test("property: always in [0,1] and 1 exactly on equal strings") {
    val rnd = new scala.util.Random(7)
    (1 to 300).foreach { _ =>
      val a = (1 to rnd.nextInt(10)).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
      val b = (1 to rnd.nextInt(10)).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
      val s = JaroWinkler.similarity(a, b)
      assert(s >= 0.0 && s <= 1.0, s"($a, $b) -> $s")
      assert(JaroWinkler.similarity(a, a) === (if (a.isEmpty) 0.0 else 1.0))
      assert(s === JaroWinkler.similarity(b, a), s"symmetry ($a, $b)")
    }
  }
}
