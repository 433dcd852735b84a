package graft.operators

import graft.SparkSpec

class DescriptorsSpec extends SparkSpec {

  test("resolves codes via dimension and passes unmatched codes through (J3)") {
    import spark.implicits._
    val facts = Seq(("MA", 1), ("PR", 2), ("ZZ", 3)).toDF("code", "id")
    val dim = Seq(("MA", "Mailing"), ("PR", "Permanent")).toDF("codeValue", "shortDescription")
    val out = Descriptors
      .resolve(facts, dim, "code", "codeValue", "shortDescription", "uri", "uri://ed-fi.org/AddressType#")
      .orderBy("id")
      .collect()
      .map(_.getAs[String]("uri"))
    assert(out.toSeq === Seq(
      "uri://ed-fi.org/AddressType#Mailing",
      "uri://ed-fi.org/AddressType#Permanent",
      "ZZ")) // passthrough fallback (SisConnectorService.java:510-516)
  }

  test("duplicate dimension codes don't fan out fact rows") {
    import spark.implicits._
    val facts = Seq(("MA", 1)).toDF("code", "id")
    val dim = Seq(("MA", "Mailing"), ("MA", "Mailing2")).toDF("codeValue", "shortDescription")
    val out = Descriptors.resolve(facts, dim, "code", "codeValue", "shortDescription", "uri", "p#")
    assert(out.count() === 1)
  }

  test("uses a broadcast hash join (no shuffle of the fact side)") {
    import spark.implicits._
    val facts = Seq(("MA", 1)).toDF("code", "id")
    val dim = Seq(("MA", "Mailing")).toDF("codeValue", "shortDescription")
    val plan = Descriptors.resolve(facts, dim, "code", "codeValue", "shortDescription", "u", "p#")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$plan")
  }
}
