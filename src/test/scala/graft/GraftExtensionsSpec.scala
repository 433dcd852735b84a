package graft

class GraftExtensionsSpec extends SparkSpec {

  test("vec_dot is callable from SQL after runtime registration") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq((Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))).toDF("a", "b").createOrReplaceTempView("v")
    try {
      val got = spark.sql("SELECT vec_dot(a, b) AS d FROM v").collect()(0).getDouble(0)
      assert(got === 11.0)
      // type misuse surfaces as an analysis error with the declared types
      val err = intercept[Exception](spark.sql("SELECT vec_dot(1, 2)").collect())
      assert(err.getMessage.toLowerCase.contains("array<float>"))
    } finally spark.sql("DROP VIEW IF EXISTS v")
  }

  test("registration is idempotent and registry-visible") {
    GraftExtensions.register(spark)
    GraftExtensions.register(spark) // createOrReplace semantics: no throw
    assert(spark.catalog.functionExists("vec_dot"))
  }
}
