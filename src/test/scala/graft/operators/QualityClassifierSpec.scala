package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  // Linearly separable corpus: "good"-docs (label 1, md5-bucket 1) vs
  // "spam"-docs (label 0, md5-bucket 3) — disjoint feature buckets.
  private def corpus = Seq(
    (1L, "good good good text here", 1),
    (2L, "good stuff good quality", 1),
    (3L, "good good good good", 1),
    (4L, "spam spam spam offer", 0),
    (5L, "spam click spam now", 0),
    (6L, "spam spam spam spam spam", 0)
  ).toDF("doc_id", "text", "label")

  private def feats(df: org.apache.spark.sql.DataFrame) =
    QualityClassifier.features(df, "doc_id", "text", col("label") === 1, numBuckets = 8)

  test("learns a linearly separable corpus: every prediction matches its label") {
    val f = feats(corpus)
    val m = QualityClassifier.fit(f, numBuckets = 8, steps = 30, learningRate = 1.0)
    val got = QualityClassifier.score(f, "doc_id", m)
      .join(corpus.select("doc_id", "label"), "doc_id")
      .collect()
    assert(got.length === 6)
    got.foreach(r => assert(r.getAs[Int]("pred") === r.getAs[Int]("label"),
      s"doc ${r.getAs[Long]("doc_id")}"))
    // positive docs score strictly above negative docs
    val pos = got.filter(_.getAs[Int]("label") == 1).map(_.getAs[Double]("score")).min
    val neg = got.filter(_.getAs[Int]("label") == 0).map(_.getAs[Double]("score")).max
    assert(pos > neg)
  }

  test("training is deterministic: two fits produce identical weights") {
    val f = feats(corpus).localCheckpoint(true)
    val m1 = QualityClassifier.fit(f, numBuckets = 8, steps = 5)
    val m2 = QualityClassifier.fit(f, numBuckets = 8, steps = 5)
    assert(m1 === m2)
    org.apache.spark.sql.graft.bridge.freeLocalCheckpoint(f)
  }

  test("zero model scores exactly 0.5 everywhere; one step moves toward the labels") {
    val f = feats(corpus)
    val zero = QualityClassifier.LogisticModel(Seq.fill(8)(0.0), 0.0, 0.0)
    QualityClassifier.score(f, "doc_id", zero).collect()
      .foreach(r => assert(r.getAs[Double]("score") === 0.5))
    val m1 = QualityClassifier.fit(f, numBuckets = 8, steps = 1)
    // bucket 1 ("good", positive docs) weight up; bucket 3 ("spam") down
    assert(m1.bucketWeights(1) > 0.0)
    assert(m1.bucketWeights(3) < 0.0)
  }

  test("scan-side feature twin equals the explode+groupBy form on every row") {
    val df = Seq(
      (1L, "good good spam here", 1), (2L, "", 0), (3L, "   ", 1),
      (4L, "one two three four five six", 0)).toDF("doc_id", "text", "label")
    val a = feats(df).drop("y").orderBy("doc_id").collect()
    val b = QualityClassifier.featuresScanSide(df, "doc_id", "text", numBuckets = 8)
      .orderBy("doc_id").collect()
    assert(a.length === b.length)
    a.zip(b).foreach { case (ra, rb) =>
      assert(ra.getAs[Long]("doc_id") === rb.getAs[Long]("doc_id"))
      ((0 until 8).map(j => s"x$j") :+ "xl").foreach { c =>
        assert(ra.getAs[Double](c) === rb.getAs[Double](c), s"col $c")
      }
    }
  }

  test("zero-token documents get all-zero features and the bias-only score") {
    val df = Seq((1L, "good good", 1), (2L, "   ", 0)).toDF("doc_id", "text", "label")
    val f = feats(df)
    val row = f.where(col("doc_id") === 2).head()
    (0 until 8).foreach(j => assert(row.getAs[Double](s"x$j") === 0.0))
    assert(row.getAs[Double]("xl") === 0.0)
    val m = QualityClassifier.LogisticModel(Seq.fill(8)(0.3), 0.2, -1.0)
    val s = QualityClassifier.score(f, "doc_id", m)
      .where(col("doc_id") === 2).head().getAs[Double]("score")
    // σ(-1) = 0.26894…, rounded to 6 decimals
    assert(math.abs(s - 0.268941) < 1e-9)
  }
}
