package graft.operators

import graft.SparkSpec

class QueryLikelihoodSpec extends SparkSpec {
  import spark.implicits._

  private def q9(x: Double): BigDecimal =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)

  test("scores match the hand-computed Dirichlet formula; ranking favors tf") {
    val docs = Seq(
      (1L, "apple apple banana"),
      (2L, "apple cherry cherry date"),
      (3L, "banana date date")).toDF("doc_id", "text")
    val mu = 10.0
    // collection: 10 tokens; cf(apple)=3, cf(banana)=2
    val got = QueryLikelihood.score(docs, "doc_id", "text",
        Seq("apple", "banana"), mu = mu, topK = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def term(tf: Long, cf: Long, dl: Long): BigDecimal =
      q9(math.log((tf + mu * (cf / 10.0)) / (dl + mu)))
    def r6(x: BigDecimal): Double =
      x.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) === r6(term(2, 3, 3) + term(1, 2, 3)))
    assert(got(2L) === r6(term(1, 3, 4) + term(0, 2, 4)))
    assert(got(3L) === r6(term(0, 3, 3) + term(1, 2, 3)))
    // doc 1 has both terms -> best
    assert(got(1L) > got(2L) && got(1L) > got(3L))
  }

  test("collection-absent query terms drop; absent-everywhere ranking still total") {
    val docs = Seq((1L, "alpha beta"), (2L, "alpha alpha")).toDF("doc_id", "text")
    val withGhost = QueryLikelihood.score(docs, "doc_id", "text",
        Seq("alpha", "zzz_unseen"), mu = 5.0, topK = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val without = QueryLikelihood.score(docs, "doc_id", "text",
        Seq("alpha"), mu = 5.0, topK = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(withGhost === without)
    assert(without(2L) > without(1L))
  }

  test("topK cuts under the deterministic (score desc, id asc) order") {
    // identical docs tie exactly; id breaks the tie
    val docs = Seq((5L, "same text"), (2L, "same text"), (9L, "same text"))
      .toDF("doc_id", "text")
    val got = QueryLikelihood.score(docs, "doc_id", "text", Seq("same"),
        mu = 5.0, topK = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(2L, 5L))
  }
}
