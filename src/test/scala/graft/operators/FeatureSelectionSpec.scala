package graft.operators

import graft.SparkSpec

class FeatureSelectionSpec extends SparkSpec {
  import spark.implicits._

  test("chi2 matches the hand-computed 2x2 contingency; ubiquitous tokens drop") {
    // 4 docs, 2 per class. "pos" only in class 1, "neg" only in class 0,
    // "both" in one of each, "all" in every doc (degenerate -> excluded).
    val docs = Seq(
      (1L, "pos both all", 1),
      (2L, "pos all", 1),
      (3L, "neg both all", 0),
      (4L, "neg all", 0)).toDF("doc_id", "text", "y")
    val got = FeatureSelection.chiSquareTokens(docs, "doc_id", "text", "y", topK = 10)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    def chi2(a: Long, b: Long, n1: Long, n0: Long): Double = {
      val c = n1 - a; val d = n0 - b; val n = n1 + n0
      val diff = (a * d - b * c).toDouble
      n.toDouble * (diff * diff) /
        ((a + b).toDouble * (c + d).toDouble * (a + c).toDouble * (b + d).toDouble)
    }
    // "pos": a=2 b=0 -> chi2 = 4*(2*2)^2/(2*2*2*2) = 4
    assert(got("pos") === ((2L, 0L, chi2(2, 0, 2, 2))))
    assert(got("neg") === ((0L, 2L, chi2(0, 2, 2, 2))))
    // "both": a=1 b=1 -> ad-bc = 1*1-1*1 = 0 -> chi2 0
    assert(got("both") === ((1L, 1L, 0.0)))
    assert(!got.contains("all"), "token present in every doc must be excluded")
    assert(got("pos")._3 === 4.0)
  }

  test("repeated tokens count once per doc (presence, not frequency)") {
    val docs = Seq(
      (1L, "spam spam spam", 1),
      (2L, "ham", 0)).toDF("doc_id", "text", "y")
    val got = FeatureSelection.chiSquareTokens(docs, "doc_id", "text", "y", topK = 10)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got("spam") === ((1L, 0L)))
    assert(got("ham") === ((0L, 1L)))
  }

  test("topK truncates under the deterministic (chi2 desc, token asc) order") {
    val docs = Seq(
      (1L, "aa bb", 1), (2L, "cc dd", 0)).toDF("doc_id", "text", "y")
    val got = FeatureSelection.chiSquareTokens(docs, "doc_id", "text", "y", topK = 2)
      .collect().map(_.getString(0)).toSeq
    // all four tokens tie at chi2=2; token asc breaks the tie
    assert(got === Seq("aa", "bb"))
  }
}
