package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class VectorsSpec extends SparkSpec {
  import spark.implicits._

  test("native HyperplaneSignature equals the HOF reference on real embeddings") {
    val emb = Tables.load(spark, sf(), "embeddings")
    for ((np, off) <- Seq((16, 0), (2, 10), (63, 0), (6, 120))) {
      val diff = emb.select(
        Vectors.hyperplaneSignature(col("embedding"), np, off).as("native"),
        Vectors.hyperplaneSignatureHof(col("embedding"), np, off).as("hof"))
        .filter(col("native") =!= col("hof")).count()
      assert(diff === 0, s"numPlanes=$np offset=$off")
    }
  }

  test("signature locality: a vector agrees with itself; oversize dim throws") {
    val df = Seq((1L, (1 to 64).map(_.toFloat))).toDF("id", "v")
    val s = df.select(
      Vectors.hyperplaneSignature(col("v"), 32).as("a"),
      Vectors.hyperplaneSignature(col("v"), 32).as("b")).collect().head
    assert(s.getLong(0) === s.getLong(1))
    val big = Seq((1L, (1 to Vectors.maxDim + 1).map(_.toFloat))).toDF("id", "v")
    val e = intercept[Exception] {
      big.select(Vectors.hyperplaneSignature(col("v"), 8)).collect()
    }
    assert(e.getMessage.contains("dim"))
  }

  test("native dot equals HOF dot bit-exact on real embeddings (regression)") {
    val emb = Tables.load(spark, sf(), "embeddings").limit(200)
    val pairs = emb.select(col("vec_id").as("a"), col("embedding").as("va"))
      .crossJoin(emb.select(col("vec_id").as("b"), col("embedding").as("vb")).limit(20))
    val diff = pairs.select(
      Vectors.dot(col("va"), col("vb")).as("n"),
      Vectors.dotHof(col("va"), col("vb")).as("h"))
      .filter(col("n") =!= col("h")).count()
    assert(diff === 0)
  }
}
