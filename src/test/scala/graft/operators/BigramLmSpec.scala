package graft.operators

import graft.SparkSpec

class BigramLmSpec extends SparkSpec {
  import spark.implicits._

  test("known answers: Laplace-smoothed conditional bigram LM") {
    // corpus: "a b a b" | "b c" | "solo"  →  bigrams: (a,b)×2, (b,a)×1,
    // (b,c)×1; contexts (bigram occurrences): c(a)=2, c(b)=2; the
    // smoothing vocabulary counts UNIGRAMS over all docs — "solo" has no
    // bigram but still widens V to 4 (a, b, c, solo)
    val docs = Seq((1L, "a b a b"), (2L, "b c"), (3L, "solo"), (4L, " "))
      .toDF("doc_id", "text")
    def p(c12: Long, c1: Long) = math.log((c12 + 1).toDouble / (c1 + 4))
    val got = BigramLm.meanLogProb(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    // doc 1 bigrams: (a,b) (b,a) (a,b)
    assert(got(1L)._1 === 3)
    assert(math.abs(got(1L)._2 - (p(2, 2) + p(1, 2) + p(2, 2)) / 3) < 1e-12)
    // doc 2: single bigram (b,c)
    assert(got(2L)._1 === 1)
    assert(math.abs(got(2L)._2 - p(1, 2)) < 1e-12)
    assert(!got.contains(3L), "one-token doc has no bigram")
    assert(!got.contains(4L), "empty doc has no bigram")
  }

  test("interpolated LM: hand-computed JM mixture; λ=0 equals unigram backoff") {
    val docs = Seq((1L, "a b a b"), (2L, "b c")).toDF("doc_id", "text")
    // bigrams: (a,b)×2 (b,a)×1 (b,c)×1; ctx a=2 b=2; uni a=2 b=3 c=1, T=6 V=3
    def term(c12: Long, c1: Long, cu: Long) =
      math.log(0.7 * (c12.toDouble / c1) + 0.3 * ((cu + 1).toDouble / (6 + 3)))
    val got = BigramLm.interpolatedMeanLogProb(docs, "doc_id", "text", lambda = 0.7)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    // doc 1: (a,b)[c12=2,c1=2,cu(b)=3], (b,a)[1,2,2], (a,b)[2,2,3]
    val expected1 = (term(2, 2, 3) + term(1, 2, 2) + term(2, 2, 3)) / 3
    assert(got(1L)._1 === 3)
    assert(math.abs(got(1L)._2 - expected1) < 1e-12)
    // λ=0 degenerates to the Laplace unigram of the SECOND token
    val uni = BigramLm.interpolatedMeanLogProb(docs, "doc_id", "text", lambda = 0.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    def puni(cu: Long) = math.log((cu + 1).toDouble / 9)
    assert(math.abs(uni(2L) - puni(1)) < 1e-12, "doc 2's (b,c): unigram of c")
  }

  test("scrambled word order scores lower than natural order") {
    // 20 docs establish "x y" as the dominant bigram; a doc in that order
    // beats the same words reversed.
    val base = Seq.tabulate(20)(i => ((i + 10).toLong, "x y x y x y"))
    val docs = (base :+ (1L, "x y x y") :+ (2L, "y x y x")).toDF("doc_id", "text")
    val scores = BigramLm.meanLogProb(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores(1L) > scores(2L))
  }
}
