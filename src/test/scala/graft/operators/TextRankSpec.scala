package graft.operators

import graft.SparkSpec

class TextRankSpec extends SparkSpec {
  import spark.implicits._

  test("cooccurrenceEdges: adjacency on the FILTERED sequence, canonical + symmetrized") {
    // minTokenLen 4 drops "of"; adjacency then bridges across it:
    // deep-learning edge exists even though "of" sat between them
    val docs = Seq("models of deep learning", "deep models").toDF("text")
    val got = TextRank.cooccurrenceEdges(docs, "text", minTokenLen = 4)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    val und = Set(
      ("deep", "models", 2.0), // doc1 models-deep (bridged), doc2 deep-models
      ("deep", "learning", 1.0))
    assert(got === und.flatMap { case (a, b, w) => Set((a, b, w), (b, a, w)) })
  }

  test("self-loops from repeated tokens drop; short docs contribute nothing") {
    val docs = Seq("spark spark spark", "word", "").toDF("text")
    assert(TextRank.cooccurrenceEdges(docs, "text", minTokenLen = 4).count() === 0)
  }

  test("keywords: matches a driver-side PageRank reference on the token graph") {
    val docs = Seq(
      "spark runs fast queries",
      "fast queries need fast plans",
      "plans drive spark").toDF("text")
    val got = TextRank.keywords(docs, "text", minTokenLen = 4,
        iterations = 3, damping = 0.85, topK = 10)
      .collect().map(r => (r.getString(0), r.getDouble(1)))

    // independent reference: brute-force edges + dense PR iteration
    val toks = Seq(
      Seq("spark", "runs", "fast", "queries"),
      Seq("fast", "queries", "need", "fast", "plans"),
      Seq("plans", "drive", "spark"))
    val w = scala.collection.mutable.Map.empty[(String, String), Double]
    toks.foreach(t => t.zip(t.tail).foreach { case (a, b) =>
      if (a != b) {
        val k = if (a < b) (a, b) else (b, a)
        w(k) = w.getOrElse(k, 0.0) + 1.0
      }
    })
    val sym = w.toSeq.flatMap { case ((a, b), x) => Seq((a, b, x), (b, a, x)) }
    val nodes = sym.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val outW = sym.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    var rank = nodes.map(_ -> 1.0 / nodes.size).toMap
    for (_ <- 1 to 3) {
      val in = nodes.map { v =>
        v -> sym.filter(_._2 == v)
          .map { case (s, _, x) => x / outW(s) * rank(s) }.sum
      }.toMap
      rank = nodes.map(v => v -> (0.15 / nodes.size + 0.85 * in(v))).toMap
    }
    val expect = nodes.map(v => (v,
        BigDecimal(rank(v)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .sortBy { case (t, r) => (-r, t) }
    assert(got.map(_._1).toSeq === expect.map(_._1))
    got.zip(expect).foreach { case ((t, r), (te, re)) =>
      assert(math.abs(r - re) < 2e-6, s"$t: got $r want $re")
    }
  }
}
