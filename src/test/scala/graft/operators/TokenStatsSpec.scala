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

  test("heapsFit: matches a brute-force growth curve + OLS reference") {
    // 60 docs, vocabulary shared across docs so later prefixes add fewer
    // new terms (genuine sub-linear growth); empty doc contributes nothing
    val docs = ((1L to 59L).map { i =>
      val shared = s"common${i % 7} common${i % 3}"
      (i, s"$shared word${i} word${i / 2}")
    } :+ (60L, "")).toDF("doc_id", "text")
    val nb = 4
    val got = TokenStats.heapsFit(docs, "doc_id", "text", numPrefixes = nb).collect()
    assert(got.length === 1)
    val row = got.head

    // reference: the same md5 bucket assignment (queried through the
    // engine's own hashUnit — its md5 arithmetic has its own oracle
    // gates), then brute-force prefix unions + sample-moment OLS
    import org.apache.spark.sql.functions.{col, floor}
    val bucketOf = docs
      .select(col("doc_id"),
        floor(Curation.hashUnit(col("doc_id"), "heaps") * nb).cast("int").as("b"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val toks = docs.collect().map { r =>
      val t = r.getString(1)
      r.getLong(0) -> (if (t.trim.isEmpty) Seq.empty[String]
                       else t.trim.toLowerCase.split("\\s+").toSeq)
    }.toMap
    val pts = (0 until nb).flatMap { b =>
      val ids = (1L to 60L).filter(i => bucketOf(i) <= b)
      val ct = ids.map(toks(_).size).sum
      val cv = ids.flatMap(toks(_)).distinct.size
      // only keep buckets that exist in the observed frame
      if ((1L to 60L).exists(i => bucketOf(i) == b && toks(i).nonEmpty)) Some((ct, cv))
      else None
    }.filter(p => p._1 > 0 && p._2 > 0)
    // mirror the engine's exact-decimal moment scheme: quantize the log
    // points to 9 decimals, sum exactly, derive the fit as doubles
    def q9(v: Double) = BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val xs = pts.map(p => q9(math.log(p._1.toDouble)))
    val ys = pts.map(p => q9(math.log(p._2.toDouble)))
    val n = xs.size.toDouble
    val (sx, sy) = (xs.sum.toDouble, ys.sum.toDouble)
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum.toDouble
    val sxx = xs.map(x => x * x).sum.toDouble
    val syy = ys.map(y => y * y).sum.toDouble
    val cov = (sxy - sx * sy / n) / (n - 1.0)
    val vx = (sxx - sx * sx / n) / (n - 1.0)
    val vy = (syy - sy * sy / n) / (n - 1.0)
    val beta = cov / vx

    assert(row.getAs[Int]("n_prefixes") === xs.size)
    assert(row.getAs[Long]("total_tokens") === pts.last._1.toLong)
    assert(row.getAs[Long]("vocabulary") === pts.last._2.toLong)
    assert(math.abs(row.getAs[Double]("beta") - beta) < 1e-12,
      s"beta: got ${row.getAs[Double]("beta")} want $beta")
    assert(math.abs(row.getAs[Double]("k") -
      math.exp(sy / n - cov / vx * (sx / n))) < 1e-12)
    assert(math.abs(row.getAs[Double]("r2") - cov * cov / (vx * vy)) < 1e-12)
    assert(row.getAs[Double]("beta") > 0 && row.getAs[Double]("beta") < 1,
      "shared vocabulary must fit sub-linear growth")
  }

  test("heapsFit: constant cumulative vocabulary yields NULL beta/k/r2, never noise") {
    // every doc shares the same 3 tokens -> V(prefix) is constant; the
    // min=max degeneracy guard must return NULL deterministically
    // (variance-based guards flip on parallel-merge last-ulp noise)
    val docs = (1L to 40L).map(i => (i, "aa bb cc")).toDF("doc_id", "text")
    val row = TokenStats.heapsFit(docs, "doc_id", "text", numPrefixes = 8)
      .collect().head
    assert(row.getAs[Long]("vocabulary") === 3L)
    assert(row.isNullAt(row.fieldIndex("r2")), "r2 must be NULL on constant V")
    // beta is 0 when x varies but y doesn't; it must be exactly 0, not noise
    assert(row.getAs[Double]("beta") === 0.0)
  }
}
