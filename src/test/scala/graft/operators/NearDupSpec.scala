package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.functions.{Hashing, TextAnalysis}

class NearDupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sf(), "documents")

  test("exactDedup keeps the min-id representative per content group") {
    val df = Seq((10, "same text"), (3, "same text"), (7, "other")).toDF("id", "text")
    val out = NearDup.exactDedup(df, "id", "text").orderBy("id").collect()
    assert(out.map(_.getInt(0)).toSeq === Seq(3, 7))
  }

  test("MinHash+LSH pairs equal exact inverted-index pairs on the corpus (J≥0.8)") {
    val exact = NearDup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = NearDup.minHashLshPairs(docs, "doc_id", "text", 3, 64, 16, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "testdata should contain planted near-duplicates")
    assert(lsh === exact)
  }

  test("SimHash block pairs equal brute-force hamming pairs (pigeonhole recall)") {
    val base = docs.select(
      col("doc_id"),
      Hashing.simHash(TextAnalysis.tokens(col("text"))).as("sim"))
    val a = base.toDF("id_a", "sim_a")
    val b = base.toDF("id_b", "sim_b")
    val brute = a.join(b, col("id_a") < col("id_b"))
      .filter(Hashing.hamming(col("sim_a"), col("sim_b")) <= 3)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val blocked = NearDup.simHashPairs(docs, "doc_id", "text", 3, 4)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked === brute)
    assert(brute.nonEmpty)
  }

  test("dropDuplicatesByPairs removes exactly the greater-id pair members") {
    val d = Seq((1, "x"), (2, "y"), (3, "z")).toDF("id", "text")
    val pairs = Seq((1, 3)).toDF("id_a", "id_b")
    val kept = NearDup.dropDuplicatesByPairs(d, "id", pairs)
      .collect().map(_.getInt(0)).toSet
    assert(kept === Set(1, 2))
  }

  test("ngramJaccardPairs maxDocFreq cap drops hot-shingle work but keeps high-J pairs") {
    val capped = NearDup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8, maxDocFreq = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = NearDup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // planted dups share mostly doc-unique shingles, so the cap keeps them
    assert(capped === exact)
  }
}
