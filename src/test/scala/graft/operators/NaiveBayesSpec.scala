package graft.operators

import graft.SparkSpec

class NaiveBayesSpec extends SparkSpec {
  import spark.implicits._

  private def ref9(x: Double): BigDecimal =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)

  test("train+score matches a hand-computed Laplace-smoothed reference") {
    // class 1: "good good fine", "good"; class 0: "bad bad", "sad bad fine"
    val docs = Seq(
      (1L, "good good fine", 1),
      (2L, "good", 1),
      (3L, "bad bad", 0),
      (4L, "sad bad fine", 0)).toDF("doc_id", "text", "y")
    val (model, stats) = NaiveBayes.train(docs, "doc_id", "text", "y")

    // counts: good (0,3) fine (1,1) bad (3,0) sad (1,0); t0=5 t1=4 V=4
    val v = 4; val t0 = 5; val t1 = 4
    def ll(c: Int, t: Int) = ref9(math.log((c + 1.0) / (t + v)))
    val gotModel = model.collect()
      .map(r => r.getString(0) -> (r.getDecimal(1), r.getDecimal(2))).toMap
    assert(gotModel.keySet === Set("good", "fine", "bad", "sad"))
    assert(BigDecimal(gotModel("good")._1) === ll(0, t0))
    assert(BigDecimal(gotModel("good")._2) === ll(3, t1))
    assert(BigDecimal(gotModel("bad")._1) === ll(3, t0))
    assert(BigDecimal(gotModel("bad")._2) === ll(0, t1))
    val st = stats.collect().head
    assert(BigDecimal(st.getDecimal(0)) === ref9(math.log(2.0 / 4)))
    assert(BigDecimal(st.getDecimal(1)) === ref9(math.log(2.0 / 4)))
    assert(BigDecimal(st.getDecimal(2)) === ref9(math.log(1.0 / (t0 + v))))

    val scored = NaiveBayes.score(docs, "doc_id", "text", model, stats)
      .collect().map(r => r.getLong(0) -> (r.getDouble(3), r.getInt(4))).toMap
    // doc 1 reference margin: priors equal, so margin = sum(ll1) - sum(ll0)
    val m1 = (ll(3, t1) * 2 + ll(1, t1)) - (ll(0, t0) * 2 + ll(1, t0))
    assert(scored(1L)._2 === 1 && scored(3L)._2 === 0 && scored(4L)._2 === 0)
    assert(math.abs(scored(1L)._1 -
      m1.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("unseen tokens fall back to the smoothed default; empty docs score on priors") {
    val train = Seq(
      (1L, "alpha alpha", 1), (2L, "beta beta beta", 0)).toDF("doc_id", "text", "y")
    val (model, stats) = NaiveBayes.train(train, "doc_id", "text", "y")
    val test = Seq((10L, "gamma"), (11L, "")).toDF("doc_id", "text")
    val got = NaiveBayes.score(test, "doc_id", "text", model, stats)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getInt(4)))
      .toMap
    // unseen "gamma": s_y = prior_y + def_y; t0=3 t1=2 V=2 → def0=ln(1/5), def1=ln(1/4)
    val (s0, s1, pred) = got(10L)
    assert(math.abs(s0 - (ref9(math.log(0.5)) + ref9(math.log(1.0 / 5))).toDouble) < 1e-9)
    assert(math.abs(s1 - (ref9(math.log(0.5)) + ref9(math.log(1.0 / 4))).toDouble) < 1e-9)
    assert(pred === 1) // ln(1/4) > ln(1/5)
    // empty doc: priors only (equal) → tie-break pred = 1, margin 0
    assert(got(11L)._1 === ref9(math.log(0.5)).toDouble)
    assert(got(11L)._3 === 1)
  }

  test("prediction is exactly the sign of the exact decimal margin (shuffle-proof)") {
    // 40 docs with mixed vocab; re-score under different partitioning
    // and require identical margins/preds
    val docs = (1L to 40L).map { i =>
      (i, (1 to (i % 7 + 1).toInt).map(j => s"w${(i + j) % 11}").mkString(" "),
        (i % 2).toInt)
    }.toDF("doc_id", "text", "y")
    val (model, stats) = NaiveBayes.train(docs, "doc_id", "text", "y")
    val a = NaiveBayes.score(docs, "doc_id", "text", model, stats)
      .collect().map(r => (r.getLong(0), r.getDouble(3), r.getInt(4))).sortBy(_._1)
    val b = NaiveBayes.score(docs.repartition(13), "doc_id", "text", model, stats)
      .collect().map(r => (r.getLong(0), r.getDouble(3), r.getInt(4))).sortBy(_._1)
    assert(a.toSeq === b.toSeq)
  }

  test("train fails loudly on a single-class corpus (no ANSI log(0) fault)") {
    val allOnes = Seq((1L, "good stuff", 1), (2L, "more good", 1))
      .toDF("doc_id", "text", "y")
    val e1 = intercept[IllegalArgumentException] {
      NaiveBayes.train(allOnes, "doc_id", "text", "y")
    }
    assert(e1.getMessage.contains("BOTH classes"))
    val allZeros = Seq((1L, "bad stuff", 0)).toDF("doc_id", "text", "y")
    val e0 = intercept[IllegalArgumentException] {
      NaiveBayes.train(allZeros, "doc_id", "text", "y")
    }
    assert(e0.getMessage.contains("BOTH classes"))
  }
}
