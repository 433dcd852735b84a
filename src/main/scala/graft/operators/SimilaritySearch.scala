package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.bridge

import graft.expressions.TopKScoreId
import graft.functions.Vectors

/** Approximate-nearest-neighbor search over an `array<float>` embedding
  * column.
  *
  * Baseline: brute-force cosine top-k — the query set is broadcast, the
  * corpus is scanned exactly once, per-partition top-k is taken **before**
  * the shuffle so only `numPartitions × k` candidate rows move, then the
  * final top-k per query comes from a tiny sort. This is the plan that
  * survives a 100 TB corpus: no corpus shuffle, no window over the full
  * cross product.
  *
  * Scale path: SRP-LSH bucketing — corpus signatures computed scan-side,
  * candidates restricted to low-Hamming buckets, ranking only within
  * candidates.
  */
object SimilaritySearch {

  /** Exact top-k neighbors for each query vector.
    *
    * @param corpus  (idCol, vecCol, ...) — arbitrarily large
    * @param queries (idCol, vecCol)      — small, broadcastable
    * @return (query_id, neighbor_id, cosine, rank) with rank 1..k
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val scored = graft.Tables.spread(corpus)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
      .join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", Vectors.cosine(col("__qv"), col("__cv")))
      .select("query_id", "neighbor_id", "cosine")
    topKPerKey(scored, "query_id", k)
  }

  /** SRP-LSH approximate top-k: corpus + queries get hyperplane bit
    * signatures; candidates are corpus rows whose signature is within
    * `maxHamming` of the query's (cheap bit ops on a broadcast query set),
    * ranked by exact cosine within the candidate set only.
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      numPlanes: Int = 16,
      maxHamming: Int = 6): DataFrame = {
    val q = queries.select(
      col(idCol).as("query_id"),
      col(vecCol).as("__qv"),
      Vectors.hyperplaneSignature(col(vecCol), numPlanes).as("__qsig"))
    val c = graft.Tables.spread(corpus).select(
      col(idCol).as("neighbor_id"),
      col(vecCol).as("__cv"),
      Vectors.hyperplaneSignature(col(vecCol), numPlanes).as("__csig"))
    val scored = c
      .join(
        broadcast(q),
        col("query_id") =!= col("neighbor_id") &&
          bit_count(col("__qsig").bitwiseXOR(col("__csig"))) <= maxHamming)
      .withColumn("cosine", Vectors.cosine(col("__qv"), col("__cv")))
      .select("query_id", "neighbor_id", "cosine")
    topKPerKey(scored, "query_id", k)
  }

  /** Distributed top-k per key via the bounded-heap aggregate
    * [[TopKScoreId]]: every input row is an O(log k) MAP-SIDE heap update
    * inside the hash aggregate, partial buffers of ≤ k entries shuffle,
    * and the full candidate set is never sorted anywhere. Tie-break
    * (score desc, id asc) matches the window form and the oracle exactly.
    *
    * Null/NaN-score rows are unrankable and excluded (both forms); a key
    * with NO rankable candidates is absent from the output.
    */
  def topKPerKey(scored: DataFrame, keyCol: String, k: Int): DataFrame = {
    val agg = bridge.column(
      TopKScoreId(
        bridge.expression(col("cosine")),
        bridge.expression(col("neighbor_id")),
        k).toAggregateExpression())
    scored
      .groupBy(col(keyCol))
      .agg(agg.as("__topk"))
      .select(col(keyCol), posexplode(col("__topk")))
      .select(
        col(keyCol),
        col("col.id").as("neighbor_id"),
        col("col.score").as("cosine"),
        (col("pos") + 1).as("rank"))
  }

  /** Window-function top-k, kept as the cross-check reference for
    * [[topKPerKey]] (spec-asserted equal, including the null/NaN-score
    * exclusion). Two-phase: phase 1 prunes to k rows per
    * (key, input-partition); phase 2 ranks the survivors. Still sorts
    * candidates within partitions — the aggregate form replaces it.
    */
  def topKPerKeyWindow(scored: DataFrame, keyCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byPart = Window
      .partitionBy(col(keyCol), spark_partition_id())
      .orderBy(col("cosine").desc, col("neighbor_id"))
    val pruned = scored
      .filter(col("cosine").isNotNull && !isnan(col("cosine")))
      .withColumn("__pr", row_number().over(byPart))
      .filter(col("__pr") <= k)
      .drop("__pr")
    val global = Window
      .partitionBy(col(keyCol))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    pruned
      .withColumn("rank", row_number().over(global))
      .filter(col("rank") <= k)
  }

  /** IVF (inverted-file) approximate top-k: the corpus is partitioned into
    * Voronoi cells around `numCentroids` centroids; a query is ranked only
    * against the cells of its `nprobe` nearest centroids.
    *
    * Centroid selection is deterministic hash-sampling of corpus vectors
    * (k-means iterations refine recall but aren't required for the
    * structure); the centroid set is a driver-side MODEL ARTIFACT (like any
    * trained index) embedded as plan literals, so cell assignment is
    * scan-side arithmetic — no shuffle, no join against a centroid table.
    * The only movement: each corpus row to its cell's reducers via the
    * top-k hash aggregate, exactly as [[bruteForceTopK]] but over
    * corpus/numCentroids-sized slices.
    *
    * @param nprobe cells probed per query — recall/latency dial
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      numCentroids: Int = 16,
      nprobe: Int = 4): DataFrame = {
    require(nprobe <= numCentroids)
    // deterministic sample: the numCentroids corpus vectors with smallest
    // hashed id (reproducible, no rand())
    val centroids: Array[Seq[Float]] = corpus
      .select(col(idCol), col(vecCol))
      .withColumn("__h", xxhash64(col(idCol)))
      .orderBy("__h")
      .limit(numCentroids)
      .collect()
      .map(r => r.getSeq[Float](1))
    val cLits = centroids.map(c => typedlit(c))
    // nearest-centroid assignment, scan-side: argmax of dot over literals
    def bestCells(v: org.apache.spark.sql.Column, n: Int) = {
      val scoredCells = array(cLits.zipWithIndex.map { case (c, i) =>
        struct(Vectors.cosine(v, c).as("s"), lit(i).as("cell"))
      }: _*)
      slice(reverse(array_sort(scoredCells)), 1, n)
    }
    val c = graft.Tables.spread(corpus).select(
      col(idCol).as("neighbor_id"),
      col(vecCol).as("__cv"),
      element_at(bestCells(col(vecCol), 1), 1).getField("cell").as("__cell"))
    val q = queries.select(
      col(idCol).as("query_id"),
      col(vecCol).as("__qv"),
      explode(transform(bestCells(col(vecCol), nprobe), e => e.getField("cell")))
        .as("__cell"))
    val scored = c
      .join(broadcast(q), Seq("__cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", Vectors.cosine(col("__qv"), col("__cv")))
      .select("query_id", "neighbor_id", "cosine")
    topKPerKey(scored, "query_id", k)
  }

  /** All corpus pairs with cosine ≥ threshold (embedding near-dup).
    * Exact O(n²) baseline — fine for dimension tables / verification; use
    * [[lshTopK]]-style bucketing when n is web-scale.
    */
  def cosinePairs(
      corpus: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    // the streamed (left) side of the nested-loop join is spread so pair
    // scoring parallelizes; the right side broadcasts
    val a = graft.Tables.spread(corpus).select(col(idCol).as("id_a"), col(vecCol).as("__va"))
    val b = corpus.select(col(idCol).as("id_b"), col(vecCol).as("__vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cosine", Vectors.cosine(col("__va"), col("__vb")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
