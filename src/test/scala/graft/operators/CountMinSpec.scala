package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CountMinSpec extends SparkSpec {

  private def counts(pairs: (String, Long)*): Map[String, Long] = pairs.toMap

  test("wide sketch recovers exact counts; estimates never undercount") {
    val spark2 = spark
    import spark2.implicits._
    val rows = Seq.fill(7)("a") ++ Seq.fill(3)("b") ++ Seq.fill(1)("c")
    val df = rows.toDF("k")
    val sk = CountMin.sketch(df, "k", depth = 4, width = 64)
    val probes = Seq("a", "b", "c", "never-seen").toDF("k")
    val est = CountMin.estimate(probes, "k", sk, depth = 4, width = 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 3 keys in 64 buckets × 4 independent rows: a collision on every
    // depth row is (3/64)^4-improbable and deterministic — exact here.
    assert(est === counts("a" -> 7L, "b" -> 3L, "c" -> 1L, "never-seen" -> 0L))
  }

  test("degenerate width=1 collapses every key to the grand total (upper bound)") {
    val spark2 = spark
    import spark2.implicits._
    val df = (Seq.fill(5)("x") ++ Seq.fill(2)("y")).toDF("k")
    val sk = CountMin.sketch(df, "k", depth = 2, width = 1)
    val est = CountMin.estimate(Seq("x", "y").toDF("k"), "k", sk, 2, 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est === counts("x" -> 7L, "y" -> 7L))
  }

  test("merged shard sketches estimate exactly like the union sketch") {
    val spark2 = spark
    import spark2.implicits._
    val shard1 = (Seq.fill(4)("a") ++ Seq.fill(2)("b")).toDF("k")
    val shard2 = (Seq.fill(3)("a") ++ Seq.fill(5)("c")).toDF("k")
    val merged = CountMin.merge(
      CountMin.sketch(shard1, "k", 4, 32),
      CountMin.sketch(shard2, "k", 4, 32))
    val whole = CountMin.sketch(shard1.unionByName(shard2), "k", 4, 32)
    val probes = Seq("a", "b", "c").toDF("k")
    val estM = CountMin.estimate(probes, "k", merged, 4, 32)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val estW = CountMin.estimate(probes, "k", whole, 4, 32)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(estM === estW)
    assert(estM === counts("a" -> 7L, "b" -> 2L, "c" -> 5L))
  }

  test("null keys are excluded from the sketch") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(Some("a"), None, Some("a"), None).toDF("k")
    val sk = CountMin.sketch(df, "k", 2, 16)
    val total = sk.where(col("depth_j") === 0).agg(sum("cnt")).head().getLong(0)
    assert(total === 2L)
  }
}
