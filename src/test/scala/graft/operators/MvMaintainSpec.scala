package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MvMaintainSpec extends SparkSpec {
  import spark.implicits._

  test("known answers: insert, retract, key churn to zero drops out") {
    val base = Seq(("a", 10.00), ("a", 5.00), ("b", 3.00)).toDF("k", "v")
    val mv0 = MvMaintain.buildMv(base, "k", "v")
    val delta = Seq(
      ("a", 1, 2.00),   // insert
      ("b", -1, 3.00),  // retract b's only row → b disappears
      ("c", 1, 7.00)    // brand-new key
    ).toDF("k", "sign", "v")
    val got = MvMaintain.applyDelta(mv0, delta, "k", "sign", "v")
      .orderBy("k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2).doubleValue()))
    assert(got === Array(("a", 3L, 17.00), ("c", 1L, 7.00)))
  }

  test("maintenance equals rebuild over a random churn sequence") {
    val orders = graft.Tables.load(spark, sf(), "orders")
    val base = orders.where(col("o_orderkey") % 3 =!= 0)
    val inserts = orders.where(col("o_orderkey") % 3 === 0)
      .select(col("o_custkey"), lit(1).as("sign"), col("o_totalprice").as("v"))
    val deletes = base.where(col("o_orderkey") % 7 === 0)
      .select(col("o_custkey"), lit(-1).as("sign"), col("o_totalprice").as("v"))
    val maintained = MvMaintain.applyDelta(
      MvMaintain.buildMv(base, "o_custkey", "o_totalprice"),
      inserts.unionByName(deletes), "o_custkey", "sign", "v")
    val rebuilt = MvMaintain.buildMv(
      orders.where(col("o_orderkey") % 3 === 0 || col("o_orderkey") % 7 =!= 0),
      "o_custkey", "o_totalprice")
    assert(maintained.exceptAll(rebuilt).count() === 0)
    assert(rebuilt.exceptAll(maintained).count() === 0)
  }
}
