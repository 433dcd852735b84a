package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Maximal Marginal Relevance (Carbonell & Goldstein 1998): diversified
  * top-k retrieval — greedily pick the candidate maximizing
  * `λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s)`, so results trade
  * redundancy for coverage. The standard re-rank behind every "similar
  * but not duplicate" retrieval surface, and the retrieval-side
  * complement of the SemDeDup-style corpus dedup.
  *
  * Scale split (greedy selection is INHERENTLY sequential — each pick
  * depends on all previous picks, no engine parallelizes that): the
  * DISTRIBUTED part is candidate-pool generation — exact brute-force
  * cosine + bounded-heap top-`poolSize` here ([[SimilaritySearch
  * .bruteForceTopK]]); swap in the ANN index probe ([[AnnIndex]]) at
  * corpus scale — and the greedy loop then runs on the driver over the
  * ≤`poolSize`-row pool, the same bounded-artifact discipline as the
  * IVF/PQ model fits (a tens-of-rows collect, never corpus-sized).
  * O(k·poolSize·dim) driver work.
  *
  * Portability: every greedy comparison rounds to 6 decimals with
  * ascending-id ties (the q_e19 argmax discipline); all float vectors
  * widen to double and dot/norm accumulate left-to-right in index
  * order — exactly what the unrolled-step DuckDB oracle replays.
  */
object Mmr {

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0d; var na = 0d; var nb = 0d
    var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    val d = math.sqrt(na) * math.sqrt(nb)
    if (d == 0) 0d else dot / d
  }

  /** HALF_UP like SQL `round(x, 6)` in Spark and DuckDB — `math.rint`
    * would be half-even and could disagree on exact .5 boundaries.
    */
  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Diversified top-`k` of `corpus` for `queryVec`. Output:
    * `(pick_order, idCol, relevance, mmr_score)` — `mmr_score` is the
    * criterion value at pick time (= λ·relevance for the first pick,
    * whose diversity penalty is zero).
    */
  def diversifiedTopK(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      queryVec: Array[Float],
      k: Int,
      poolSize: Int,
      lambda: Double): DataFrame = {
    require(k >= 1 && poolSize >= k, s"need 1 <= k <= poolSize, got k=$k pool=$poolSize")
    require(lambda >= 0 && lambda <= 1, s"lambda must be in [0,1], got $lambda")
    val spark = corpus.sparkSession
    import spark.implicits._
    val queries = Seq((-1L, queryVec)).toDF(idCol, vecCol)
    // distributed pool: exact cosine + bounded-heap top-poolSize
    val vecs = corpus.select(col(idCol).cast("long").as("neighbor_id"), col(vecCol).as("__vec"))
    val pool = SimilaritySearch
      .bruteForceTopK(corpus, queries, idCol, vecCol, poolSize)
      .join(vecs, "neighbor_id")
      .select(col("neighbor_id"), col("cosine"), col("__vec"))
      .collect() // bounded: poolSize rows (model-fit discipline)
      .map(r => (
        r.getLong(0),
        r.getDouble(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    // sequential greedy on the bounded pool
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Double, Double)]
    val chosen = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    val remaining = scala.collection.mutable.LinkedHashMap(pool.map(p => p._1 -> p): _*)
    for (step <- 1 to math.min(k, pool.length)) {
      val best = remaining.values.map { case (id, relv, vec) =>
        val pen = if (chosen.isEmpty) 0d else chosen.map(s => cosine(vec, s)).max
        (id, relv, lambda * relv - (1 - lambda) * pen)
      }.minBy { case (id, _, score) => (-r6(score), id) }
      selected += ((step, best._1, best._2, best._3))
      chosen += remaining(best._1)._3
      remaining.remove(best._1)
    }
    val schema = StructType(Seq(
      StructField("pick_order", IntegerType, nullable = false),
      StructField(idCol, LongType, nullable = false),
      StructField("relevance", DoubleType, nullable = false),
      StructField("mmr_score", DoubleType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(selected.map(s => Row(s._1, s._2, s._3, s._4)).toSeq, 1),
      schema)
  }
}
