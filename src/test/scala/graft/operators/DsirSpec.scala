package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val B = 64

  /** Independent replay of the engine's portable bucket hash (md5 first
    * 15 hex chars → 60-bit long, mod B) and the DSIR weight formula.
    */
  private def bucket(tok: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(tok.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16) % B
  }

  private def toks(text: String): Seq[String] = {
    val t = text.trim.toLowerCase
    if (t.isEmpty) Seq.empty else t.split("\\s+").toSeq
  }

  private def expectedWeights(
      raw: Seq[(Long, String)],
      target: Seq[String]): Map[Long, (Int, Double)] = {
    val tCounts = target.flatMap(toks).map(bucket).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rTokens = raw.map { case (id, t) => id -> toks(t).map(bucket) }
    val rCounts = rTokens.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nt = tCounts.values.sum
    val nr = rCounts.values.sum
    def ratio(b: Long): Double =
      math.log(((tCounts.getOrElse(b, 0L) + 1).toDouble * (nr + B)) /
        ((rCounts.getOrElse(b, 0L) + 1).toDouble * (nt + B)))
    rTokens.filter(_._2.nonEmpty).map { case (id, bs) =>
      id -> (bs.size, bs.groupBy(identity).map { case (b, g) => g.size * ratio(b) }.sum)
    }.toMap
  }

  test("importance weights equal the add-1 smoothed hashed log-likelihood ratio exactly") {
    val target = Seq("alpha beta gamma", "alpha beta", "gamma delta alpha")
    val raw = Seq(
      (1L, "alpha beta alpha gamma"), // target vocabulary → high
      (2L, "zeta omega nu psi"), //      disjoint vocabulary → low
      (3L, "alpha zeta"), //             mixed
      (4L, "   ")) //                    no tokens → dropped
    val got = Dsir.importanceWeights(
        raw.toDF("doc_id", "text"),
        target.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"),
        "doc_id", "text", numBuckets = B)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    val want = expectedWeights(raw, target)
    assert(got.keySet === Set(1L, 2L, 3L))
    for ((id, (n, w)) <- want) {
      assert(got(id)._1 === n, s"n_tokens for doc $id")
      assert(math.abs(got(id)._2 - w) < 1e-9, s"log_w for doc $id: got ${got(id)._2}, want $w")
    }
    assert(got(1L)._2 > got(3L)._2 && got(3L)._2 > got(2L)._2,
      "target-vocabulary doc must outrank mixed, mixed must outrank disjoint")
  }

  test("stateless scoreWithRatios agrees with the batch aggregate to IEEE noise") {
    val target = Seq("alpha beta gamma", "alpha beta")
    val raw = Seq((1L, "alpha beta alpha gamma"), (2L, "zeta omega nu"), (3L, "  "))
    val rawDf = raw.toDF("doc_id", "text")
    val tgtDf = target.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val ratios = Dsir.bucketLogRatios(rawDf, tgtDf, "doc_id", "text", B)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val nt = target.flatMap(toks).size; val nr = raw.flatMap(r => toks(r._2)).size
    val dflt = math.log((nr + B.toDouble) / (nt + B))
    val streamed = Dsir.scoreWithRatios(rawDf, "doc_id", "text", ratios, dflt, B)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    val batch = Dsir.importanceWeights(rawDf, tgtDf, "doc_id", "text", B)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    assert(streamed.keySet === batch.keySet, "empty doc drops in both paths")
    for ((id, (n, w)) <- batch) {
      assert(streamed(id)._1 === n)
      assert(math.abs(streamed(id)._2 - w) < 1e-9,
        s"fold vs aggregate for doc $id: ${streamed(id)._2} vs $w")
    }
  }

  test("selectTopK is the rounded-weight descending cut with doc_id ties") {
    val target = Seq("alpha beta")
    val raw = Seq(
      (1L, "alpha alpha"), (2L, "alpha alpha"), // identical → tie on weight
      (3L, "omega psi"), (4L, "alpha omega"))
    val got = Dsir.selectTopK(
        raw.toDF("doc_id", "text"), Seq((0L, target.head)).toDF("doc_id", "text"),
        "doc_id", "text", numBuckets = B, k = 3)
      .collect().map(_.getLong(0))
    // expected cut from the independent formula replay: rank by
    // (round(w, 6) DESC, doc_id ASC) — identical docs 1 and 2 tie and
    // must come out adjacent in id order
    val want = expectedWeights(raw, target).toSeq
      .sortBy { case (id, (_, w)) => (-math.rint(w * 1e6) / 1e6, id) }
      .map(_._1).take(3)
    assert(got.toSeq === want)
    val i1 = got.indexOf(1L); val i2 = got.indexOf(2L)
    if (i1 >= 0 && i2 >= 0) assert(i1 < i2, "equal weights break to the smaller doc_id")
  }
}
