package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TfidfSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b a"),
    (2L, "a c"),
    (3L, "c c d")).toDF("doc_id", "text")

  test("termWeights known answers (smoothed sklearn idf)") {
    def idf(df: Long) = math.log(4.0 / (df + 1)) + 1.0 // N = 3
    val got = Tfidf.termWeights(docs, "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    assert(got((1L, "a")) === ((2L, 2L, 2 * idf(2))))
    assert(got((1L, "b")) === ((1L, 1L, 1 * idf(1))))
    assert(got((3L, "c")) === ((2L, 2L, 2 * idf(2))))
    assert(got((3L, "d")) === ((1L, 1L, 1 * idf(1))))
    assert(got.size === 6) // only observed (doc, term) pairs
  }

  test("topTerms ranks by weight with deterministic term tie-break") {
    val top = Tfidf.topTerms(docs, "doc_id", "text", k = 1)
      .select("doc_id", "term").collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(top(1L) === "a") // tf 2 beats b
    assert(top(3L) === "c")
    // doc 2: "a" (df 2) and "c" (df 2) tie on tf=1 and idf — term order wins
    assert(top(2L) === "a")
  }

  test("empty doc contributes no rows") {
    val withEmpty = docs.union(Seq((4L, "  ")).toDF("doc_id", "text"))
    val ids = Tfidf.termWeights(withEmpty, "doc_id", "text")
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(ids === Set(1L, 2L, 3L))
  }
}
