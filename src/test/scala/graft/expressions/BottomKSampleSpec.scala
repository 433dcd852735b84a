package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.QuantileSketch

class BottomKSampleSpec extends SparkSpec {
  import spark.implicits._

  private def hashed(n: Int) = spark.range(n)
    .select(
      (col("id") % 4).cast("string").as("g"),
      col("id").as("rid"),
      (pmod(col("id") * 2654435761L, lit(1000003L)).cast("double") / 1000003.0)
        .as("v"),
      graft.functions.Hashing.md5Hash60(col("id").cast("string")).as("hk"))

  test("partition-order invariance: identical sketch under any repartitioning") {
    def run(parts: Int) = QuantileSketch.bottomKQuantiles(
      hashed(20000).repartition(parts), Seq("g"), col("hk"), col("v"),
      k = 128, quantiles = Seq(0.5, 0.9)).orderBy("g")
    val a = run(1).collect().toSeq
    val b = run(3).collect().toSeq
    val c = run(16).collect().toSeq
    assert(a === b && b === c, "the kept set is a function of the multiset")
  }

  test("sketch sample equals the window-rank bottom-k exactly") {
    val df = hashed(5000)
    val sample = df.groupBy("g")
      .agg(org.apache.spark.sql.graft.bridge.column(
        BottomKSample(
          org.apache.spark.sql.graft.bridge.expression(col("hk")),
          org.apache.spark.sql.graft.bridge.expression(col("v")),
          64).toAggregateExpression()).as("s"))
      .select(col("g"), explode(col("s")).as("e"))
      .select(col("g"), col("e.hk").as("hk"), col("e.value").as("v"))
    val windowed = df
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("g").orderBy("hk", "v")))
      .filter(col("rn") <= 64)
      .select("g", "hk", "v")
    assert(sample.except(windowed).isEmpty && windowed.except(sample).isEmpty)
  }

  test("below capacity the sketch is exact; estimates carry O(1/sqrt k) error above") {
    // below capacity: quantiles equal the exact percentile
    val small = hashed(300).filter(col("g") === "0") // ~75 rows < k
    val sk = QuantileSketch.bottomKQuantiles(
      small, Seq("g"), col("hk"), col("v"), k = 128, quantiles = Seq(0.5))
      .head()
    val exact = small.agg(percentile(col("v"), lit(0.5))).head().getDouble(0)
    assert(sk.getAs[Long]("sample_size") === sk.getAs[Long]("n_rows"))
    assert(sk.getAs[Double]("q_50") === exact, "full sample == exact quantile")
    // above capacity on ~uniform values: the median estimate lands within
    // a few standard errors of 0.5 (se ≈ 0.5/sqrt(256) ≈ 0.031)
    val big = QuantileSketch.bottomKQuantiles(
      hashed(40000), Seq("g"), col("hk"), col("v"),
      k = 256, quantiles = Seq(0.5)).collect()
    big.foreach { r =>
      assert(r.getAs[Long]("sample_size") === 256L)
      assert(math.abs(r.getAs[Double]("q_50") - 0.5) < 0.12,
        s"median estimate ${r.getAs[Double]("q_50")} too far from 0.5")
    }
  }

  test("null and NaN values are excluded, not admitted into the sample") {
    val df = spark.range(100).select(
      lit("g").as("g"),
      graft.functions.Hashing.md5Hash60(col("id").cast("string")).as("hk"),
      when(col("id") % 3 === 0, lit(Double.NaN))
        .when(col("id") % 3 === 1, lit(null).cast("double"))
        .otherwise(col("id").cast("double")).as("v"))
    val s = df.groupBy("g")
      .agg(org.apache.spark.sql.graft.bridge.column(
        BottomKSample(
          org.apache.spark.sql.graft.bridge.expression(col("hk")),
          org.apache.spark.sql.graft.bridge.expression(col("v")),
          1000).toAggregateExpression()).as("s"))
      .select(explode(col("s")).as("e")).select(col("e.value").as("v"))
      .collect().map(_.getDouble(0))
    assert(s.length === 33, "only the real values survive")
    assert(s.forall(v => !v.isNaN && v % 3 == 2))
  }
}
