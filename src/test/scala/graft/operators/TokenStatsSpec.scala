package graft.operators

import graft.SparkSpec

class TokenStatsSpec extends SparkSpec {
  import spark.implicits._

  test("tokenEntropy: hand-computed H, uniform > skewed, empty rows kept") {
    val docs = Seq(
      (1L, "a b c d"),          // uniform over 4 → H = ln 4
      (2L, "a a a b"),          // skewed → H = 3/4 ln(4/3) + 1/4 ln 4
      (3L, "x x x x"),          // single distinct → H = 0
      (4L, ""),                 // empty → zero row, not absent
      (5L, "    ")              // space-only → zero row (trim is space-only,
                                // matching the q_t1 tokenization contract)
    ).toDF("id", "text")
    val got = TokenStats.tokenEntropy(docs, "id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getDouble(3))))
      .toMap
    assert(got.keySet === Set(1L, 2L, 3L, 4L, 5L))
    assert(got(1L)._1 === 4 && got(1L)._2 === 4)
    assert(math.abs(got(1L)._3 - math.log(4)) < 1e-12)
    val skewed = 0.75 * math.log(4.0 / 3.0) + 0.25 * math.log(4.0)
    assert(math.abs(got(2L)._3 - skewed) < 1e-12)
    assert(got(1L)._3 > got(2L)._3) // uniform is max-entropy
    assert(got(3L) === ((4, 1, 0.0)))
    assert(got(4L) === ((0, 0, 0.0)))
    assert(got(5L) === ((0, 0, 0.0)))
  }
}
