package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.functions.Vectors

class SimilaritySearchSpec extends SparkSpec {
  import spark.implicits._

  test("cosine known answers") {
    val df = Seq(
      (Seq(1f, 0f), Seq(0f, 1f), 0.0),
      (Seq(1f, 1f), Seq(1f, 1f), 1.0),
      (Seq(0f, 0f), Seq(1f, 1f), 0.0) // zero vector guarded
    ).toDF("a", "b", "want")
      .select(Vectors.cosine(col("a"), col("b")).as("got"), col("want"))
    df.collect().foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("bruteForceTopK returns exact ranked neighbors on a synthetic corpus") {
    val corpus = Seq(
      (1L, Seq(1f, 0f)), (2L, Seq(0.9f, 0.1f)), (3L, Seq(0f, 1f)), (4L, Seq(-1f, 0f)))
      .toDF("vec_id", "embedding")
    val out = SimilaritySearch
      .bruteForceTopK(corpus, corpus.filter($"vec_id" === 1), "vec_id", "embedding", 2)
      .orderBy("rank")
      .collect()
    assert(out.map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Int]("rank"))).toSeq ===
      Seq((2L, 1), (3L, 2)))
  }

  test("two-phase topK equals single-window topK on real embeddings") {
    val emb = Tables.load(spark, sf(), "embeddings").repartition(7)
    val queries = emb.filter($"vec_id" < 4)
    val got = SimilaritySearch
      .bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // naive reference: full window, no partition pre-prune
    import org.apache.spark.sql.expressions.Window
    val q = queries.select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val naive = emb.select($"vec_id".as("neighbor_id"), $"embedding".as("cv"))
      .crossJoin(q).filter($"query_id" =!= $"neighbor_id")
      .withColumn("cosine", Vectors.cosine($"qv", $"cv"))
      .withColumn("rank", row_number().over(
        Window.partitionBy($"query_id").orderBy($"cosine".desc, $"neighbor_id")))
      .filter($"rank" <= 5)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === naive)
  }

  test("LSH topK achieves useful recall vs brute force") {
    val emb = Tables.load(spark, sf(), "embeddings")
    val queries = emb.filter($"vec_id" < 8)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(SimilaritySearch.bruteForceTopK(emb, queries, "vec_id", "embedding", 10))
    val lsh = pairs(SimilaritySearch.lshTopK(emb, queries, "vec_id", "embedding", 10, 16, 6))
    val recall = brute.intersect(lsh).size.toDouble / brute.size
    assert(recall >= 0.3, s"recall@10 = $recall") // approximate by design; floor catches regressions
    info(s"SRP-LSH recall@10 vs brute force: $recall")
  }

  test("IVF topK achieves useful recall vs brute force; probing more cells helps") {
    val emb = Tables.load(spark, sf(), "embeddings")
    val queries = emb.filter($"vec_id" < 8)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(SimilaritySearch.bruteForceTopK(emb, queries, "vec_id", "embedding", 10))
    val narrow = pairs(SimilaritySearch.ivfTopK(emb, queries, "vec_id", "embedding", 10, 16, 2))
    val wide = pairs(SimilaritySearch.ivfTopK(emb, queries, "vec_id", "embedding", 10, 16, 16))
    val rNarrow = brute.intersect(narrow).size.toDouble / brute.size
    val rWide = brute.intersect(wide).size.toDouble / brute.size
    info(s"IVF recall@10: nprobe=2 → $rNarrow, nprobe=16 (exhaustive) → $rWide")
    assert(rNarrow >= 0.2, s"narrow-probe recall floor, got $rNarrow")
    assert(rWide === 1.0, "probing every cell IS brute force")
    assert(rWide >= rNarrow)
  }

  test("cosinePairs finds symmetric threshold pairs") {
    val corpus = Seq(
      (1L, Seq(1f, 0f)), (2L, Seq(0.99f, 0.14f)), (3L, Seq(0f, 1f)))
      .toDF("vec_id", "embedding")
    val out = SimilaritySearch.cosinePairs(corpus, "vec_id", "embedding", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq((1L, 2L)))
  }
}
