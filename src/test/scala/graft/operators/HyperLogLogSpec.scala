package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Hashing

class HyperLogLogSpec extends SparkSpec {

  private def ids(n: Int, g: String = "a") = {
    val s = spark
    import s.implicits._
    (1 to n).map(i => (g, s"id_$i")).toDF("g", "id")
  }

  private def sketch(df: org.apache.spark.sql.DataFrame, p: Int = 9) =
    HyperLogLog.distinctSketch(df, Seq("g"), Hashing.md5Hash60(col("id")), p)

  test("estimate within the 3-sigma HLL bound at 10k distinct (p=9)") {
    val out = sketch(ids(10000)).collect().head
    val est = out.getAs[Double]("nd_estimate")
    // standard error 1.04/sqrt(512) ~ 4.6%; allow 3 sigma
    assert(math.abs(est - 10000.0) / 10000.0 < 0.14, s"estimate $est")
  }

  test("duplicates do not move the sketch (pure function of the distinct set)") {
    val once = sketch(ids(5000)).collect().head
    val tripled = sketch(ids(5000).union(ids(5000)).union(ids(5000))).collect().head
    assert(once.getAs[Long]("s_scaled") == tripled.getAs[Long]("s_scaled"))
    assert(once.getAs[Double]("nd_estimate") == tripled.getAs[Double]("nd_estimate"))
  }

  test("partition-order-proof: identical output at 1 and 16 partitions") {
    val df = ids(8000)
    val a = sketch(df.repartition(1)).collect().head
    val b = sketch(df.repartition(16)).collect().head
    assert(a.toSeq == b.toSeq)
  }

  test("merge law: registers(A ∪ B) == max-merge(registers(A), registers(B))") {
    val a = ids(3000)
    val b = ids(5000) // overlapping: ids 1..3000 shared
    def regs(df: org.apache.spark.sql.DataFrame) =
      HyperLogLog.registers(df, Seq("g"), Hashing.md5Hash60(col("id")), 9)
    val whole = regs(a.union(b))
    val merged = HyperLogLog.mergeRegisters(Seq("g"), regs(a), regs(b))
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty)
    val eWhole = HyperLogLog.estimateFromRegisters(whole, Seq("g"), 9).collect().head
    val eMerged = HyperLogLog.estimateFromRegisters(merged, Seq("g"), 9).collect().head
    assert(eWhole.toSeq == eMerged.toSeq)
  }

  test("small-range branch: tiny cardinality takes linear counting and is near-exact") {
    val out = sketch(ids(12)).collect().head
    val m = out.getAs[Int]("m")
    val v = out.getAs[Long]("n_zero")
    assert(m == 512 && v > 0)
    val expected = m * math.log(m.toDouble / v.toDouble)
    assert(out.getAs[Double]("nd_estimate") ==
      BigDecimal(expected).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // with 12 hashes into 512 buckets collisions are unlikely: V >= m-12
    assert(v >= 500)
    assert(math.abs(out.getAs[Double]("nd_estimate") - 12.0) < 1.5)
  }

  test("per-group isolation: groups sketch independently") {
    val df = ids(2000, "a").union(ids(100, "b"))
    val rows = sketch(df).collect().map(r => r.getAs[String]("g") -> r).toMap
    assert(math.abs(rows("a").getAs[Double]("nd_estimate") - 2000) / 2000.0 < 0.2)
    assert(math.abs(rows("b").getAs[Double]("nd_estimate") - 100) / 100.0 < 0.25)
  }

  test("p out of range rejected") {
    intercept[IllegalArgumentException] { sketch(ids(10), p = 5) }
  }
}
