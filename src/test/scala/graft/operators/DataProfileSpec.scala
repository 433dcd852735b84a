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
}
