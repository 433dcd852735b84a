package graft.operators

import graft.SparkSpec

class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  test("known answers: Laplace-smoothed corpus LM, per-doc mean") {
    // corpus: a a b | b c  →  counts a=2 b=2 c=1, T=5, V=3
    val docs = Seq((1L, "a a b"), (2L, "b c"), (3L, " ")).toDF("doc_id", "text")
    def p(c: Long) = math.log((c + 1).toDouble / (5 + 3))
    val got = UnigramLm.meanLogProb(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    assert(got(1L)._1 === 3)
    assert(math.abs(got(1L)._2 - (p(2) + p(2) + p(2)) / 3) < 1e-12)
    assert(got(2L)._1 === 2)
    assert(math.abs(got(2L)._2 - (p(2) + p(1)) / 2) < 1e-12)
    assert(!got.contains(3L), "empty doc has no tokens to score")
  }

  test("rare-token documents score lower than common-token documents") {
    val docs = Seq(
      (1L, "the the the the"),
      (2L, "zyzzyva qwertyuiop")).toDF("doc_id", "text")
      .union(Seq.tabulate(20)(i => ((i + 10).toLong, "the and of to")).toDF("doc_id", "text"))
    val scores = UnigramLm.meanLogProb(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores(1L) > scores(2L))
  }
}
