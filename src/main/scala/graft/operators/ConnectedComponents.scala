package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair graph — the transitive
  * step that turns pairwise matches into duplicate CLUSTERS.
  *
  * Why it exists: a pair list is not a dedup policy. With pairs (a,c) and
  * (b,c) (a<b<c), the pairwise keep-smaller-id rule
  * ([[NearDup.dropDuplicatesByPairs]]) keeps BOTH a and b even though all
  * three are transitively the same document; grouping the component
  * {a,b,c} and keeping its minimum keeps only a. Reference scope ends at
  * row-identity upserts (`SisConnectorService.java:410-461` re-keys rows,
  * never relates them), so this is part of the beyond-reference pipeline
  * surface.
  *
  * Algorithm: min-label propagation (each vertex repeatedly adopts the
  * smallest label among itself and its neighbors) — per round one
  * equi-join + one min-aggregate, both partitioned by vertex id, no
  * broadcast of anything corpus-sized. Rounds = graph diameter; near-dup
  * graphs are unions of near-cliques (every member pairs with most
  * others), so 2–3 rounds converge in practice; `maxIter` bounds the
  * worst case and the alternating large-star/small-star scheme (Kiveris
  * et al., "Connected Components in MapReduce and Beyond") is the
  * documented O(log n)-round upgrade if a pathological chain graph ever
  * shows up. Each round `localCheckpoint`s the label frame: iterative
  * plans otherwise nest the whole history into one exponentially deep
  * lineage that re-executes every prior round per action.
  */
object ConnectedComponents {

  /** Component labels for every vertex appearing in `pairs` (columns
    * `id_a`, `id_b`): returns `(id, cluster)` where `cluster` is the
    * minimum vertex id in the component.
    */
  def minLabelPropagation(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val spark = pairs.sparkSession
    // symmetric edge list; self-loops are harmless (min with itself)
    val edges = pairs.select(col("id_a").as("u"), col("id_b").as("v"))
      .union(pairs.select(col("id_b").as("u"), col("id_a").as("v")))
    edges.cache()
    var labels = edges.select(col("u").as("id")).distinct()
      .withColumn("cluster", col("id"))
      .localCheckpoint(true)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val nbrMin = edges
        .join(labels, edges("v") === labels("id"))
        .groupBy(col("u")).agg(min(col("cluster")).as("__nbr"))
      val next = labels
        .join(nbrMin, labels("id") === nbrMin("u"), "left")
        .select(labels("id"),
          least(col("cluster"), coalesce(col("__nbr"), col("cluster"))).as("cluster"))
        .localCheckpoint(true)
      converged = next.join(labels.withColumnRenamed("cluster", "__old"), "id")
        .filter(col("cluster") =!= col("__old"))
        .isEmpty
      labels = next
      iter += 1
    }
    require(converged,
      s"connected components did not converge in $maxIter rounds — " +
        "graph diameter exceeds the bound; raise maxIter or switch to the " +
        "large-star/small-star scheme")
    edges.unpersist()
    labels
  }

  /** Cluster assignment for a whole corpus: docs that appear in `pairs`
    * get their component's minimum id, all others are their own cluster.
    */
  def assignClusters(
      docs: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val labels = minLabelPropagation(pairs)
      .select(col("id"), col("cluster"))
    docs
      .join(labels, docs(idCol) === labels("id"), "left")
      .select(docs.columns.map(docs(_)) :+
        coalesce(col("cluster"), docs(idCol)).as("cluster_id"): _*)
  }

  /** Transitively-correct dedup: keep exactly one document (the minimum
    * id) per duplicate cluster.
    */
  def dedupByComponents(
      docs: DataFrame, idCol: String, pairs: DataFrame): DataFrame =
    assignClusters(docs, idCol, pairs)
      .filter(col(idCol) === col("cluster_id"))
      .drop("cluster_id")
}
