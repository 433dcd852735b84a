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
    val xs = pts.map(p => math.log(p._1.toDouble))
    val ys = pts.map(p => math.log(p._2.toDouble))
    val n = xs.size
    val (mx, my) = (xs.sum / n, ys.sum / n)
    val cov = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum / (n - 1)
    val vx = xs.map(x => (x - mx) * (x - mx)).sum / (n - 1)
    val vy = ys.map(y => (y - my) * (y - my)).sum / (n - 1)
    val beta = cov / vx

    assert(row.getAs[Int]("n_prefixes") === n)
    assert(row.getAs[Long]("total_tokens") === pts.last._1.toLong)
    assert(row.getAs[Long]("vocabulary") === pts.last._2.toLong)
    assert(math.abs(row.getAs[Double]("beta") - beta) < 1e-9,
      s"beta: got ${row.getAs[Double]("beta")} want $beta")
    assert(math.abs(row.getAs[Double]("k") - math.exp(my - beta * mx)) < 1e-9)
    assert(math.abs(row.getAs[Double]("r2") - cov * cov / (vx * vy)) < 1e-9)
    assert(row.getAs[Double]("beta") > 0 && row.getAs[Double]("beta") < 1,
      "shared vocabulary must fit sub-linear growth")
  }
}
