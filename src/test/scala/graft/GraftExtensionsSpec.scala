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

  test("SQL minhash_signature and hyperplane_signature equal the DSL forms") {
    GraftExtensions.register(spark)
    Tables.load(spark, sf(), "documents").orderBy("doc_id").limit(50).createOrReplaceTempView("__docs_ext")
    val sqlSig = spark.sql(
      """SELECT minhash_signature(split(lower(trim(text)), '\\s+'), 16) AS s
        |FROM __docs_ext ORDER BY doc_id""".stripMargin).collect().map(_.getSeq[Long](0))
    val dslSig = Tables.load(spark, sf(), "documents").orderBy("doc_id").limit(50)
      .select(graft.functions.Hashing.minHashSignature(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.lower(org.apache.spark.sql.functions.trim(
            org.apache.spark.sql.functions.col("text"))), "\\s+"), 16).as("s"))
      .collect().map(_.getSeq[Long](0))
    assert(sqlSig.toSeq === dslSig.toSeq)

    Tables.load(spark, sf(), "embeddings").orderBy("vec_id").limit(50).createOrReplaceTempView("__emb_ext")
    val sqlHp = spark.sql(
      "SELECT hyperplane_signature(embedding, 16, 4) AS h FROM __emb_ext ORDER BY vec_id")
      .collect().map(_.getLong(0))
    val dslHp = Tables.load(spark, sf(), "embeddings").orderBy("vec_id").limit(50)
      .select(graft.functions.Vectors.hyperplaneSignature(
        org.apache.spark.sql.functions.col("embedding"), 16, 4).as("h"))
      .collect().map(_.getLong(0))
    assert(sqlHp.toSeq === dslHp.toSeq)
  }
}
