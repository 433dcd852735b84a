package graft.operators

import graft.SparkSpec

class Bm25Spec extends SparkSpec {

  test("BM25 matches a hand-computed reference on a tiny corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "cat dog cat"),        // tf(cat)=2, dl=3
      (2L, "dog mouse"),          // tf(dog)=1, dl=2
      (3L, "bird"),               // no match
      (4L, "cat cat cat cat")     // tf(cat)=4, dl=4
    ).toDF("doc_id", "text")
    val got = Bm25.score(docs, "doc_id", "text", Seq("cat", "dog"))
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2)))
      .toMap

    val nDocs = 4.0
    val avgdl = (3 + 2 + 1 + 4) / 4.0
    def idf(df: Double) = math.log(1 + (nDocs - df + 0.5) / (df + 0.5))
    def tfn(tf: Double, dl: Double) =
      tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    // df(cat)=2 (docs 1,4), df(dog)=2 (docs 1,2)
    val want = Map(
      1L -> (2, idf(2) * tfn(2, 3) + idf(2) * tfn(1, 3)),
      2L -> (1, idf(2) * tfn(1, 2)),
      4L -> (1, idf(2) * tfn(4, 4)))

    assert(got.keySet === want.keySet, "only matching docs are scored")
    want.foreach { case (id, (nm, score)) =>
      assert(got(id)._1 === nm, s"doc $id n_terms_matched")
      assert(math.abs(got(id)._2 - score) < 1e-12, s"doc $id score")
    }
    // more occurrences of an equally-rare term never score lower
    assert(got(4L)._2 > got(2L)._2)
  }
}
