package graft.operators

import graft.SparkSpec

class MmrSpec extends SparkSpec {
  import spark.implicits._

  // a (id 1) is the top hit; b (id 2) is a near-duplicate of a; c (id 3)
  // is equally relevant but diverse. The query is deliberately NOT
  // parallel to a, so diversity and relevance genuinely compete.
  private val q = Array(1f, 0f, 0f)
  private val corpus = Seq(
    (1L, Array(0.9f, 0.43589f, 0f)),
    (2L, Array(0.9f, 0.43589f, 0.01f)), // extra off-axis mass → strictly less relevant
    (3L, Array(0.9f, -0.43589f, 0f)),
    (4L, Array(0.1f, 0.99f, 0f)))

  test("lambda=1 is pure relevance order; first pick is always the top hit") {
    val got = Mmr.diversifiedTopK(corpus.toDF("vec_id", "embedding"),
        "vec_id", "embedding", q, k = 3, poolSize = 4, lambda = 1.0)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(got.head === ((1, 1L)))
    // rel: a=b≈0.9 (a wins the id tie... a's 2nd component is larger, so
    // a and b differ past 1e-6 — order is by exact relevance), c=0.9, d=0.1
    assert(got.map(_._2).toSet === Set(1L, 2L, 3L))
  }

  test("lambda=0.5 defers the near-duplicate in favor of the diverse candidate") {
    val got = Mmr.diversifiedTopK(corpus.toDF("vec_id", "embedding"),
        "vec_id", "embedding", q, k = 2, poolSize = 4, lambda = 0.5)
      .collect().map(_.getLong(1))
    assert(got(0) === 1L, "first pick: most relevant")
    assert(got(1) === 3L, "second pick: the diverse candidate, not the near-dup")
  }

  test("scores are the greedy criterion: first = lambda*rel, later picks penalized") {
    val rows = Mmr.diversifiedTopK(corpus.toDF("vec_id", "embedding"),
        "vec_id", "embedding", q, k = 2, poolSize = 4, lambda = 0.5)
      .collect()
    val first = rows(0); val second = rows(1)
    assert(math.abs(first.getDouble(3) - 0.5 * first.getDouble(2)) < 1e-12)
    assert(second.getDouble(3) < 0.5 * second.getDouble(2),
      "later picks carry a positive diversity penalty")
  }

  test("k capped by pool; pool smaller than corpus respected") {
    val got = Mmr.diversifiedTopK(corpus.toDF("vec_id", "embedding"),
        "vec_id", "embedding", q, k = 3, poolSize = 3, lambda = 0.5)
      .collect()
    assert(got.length === 3)
    assert(got.map(_.getInt(0)).toSeq === Seq(1, 2, 3), "pick_order is 1..k")
  }
}
