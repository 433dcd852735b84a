package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic fixed-iteration Lloyd k-means over an embedding column —
  * the corpus-structuring primitive behind cluster-based curation
  * (SemDeDup-style semantic dedup, cluster-balanced sampling, diversity
  * quotas). Spark's MLlib KMeans is k-means||-seeded (randomized) and
  * cannot be oracle-gated; this variant pins every source of
  * nondeterminism:
  *
  *   - seeds = the embeddings of the k SMALLEST ids (arrival-order-free);
  *   - assignment = argmin of squared L2 distance with the distance
  *     ROUNDED to 6 decimals and ties broken on the smaller cluster
  *     index (raw-double argmin would let last-bit summation noise flip
  *     a near-tie between engines — the q_e19 discipline);
  *   - means = per-dimension EXACT-DECIMAL sums divided by counts (the
  *     q_v7 centroid idiom: cross-row float sums are order-dependent in
  *     IEEE; a DECIMAL sum is exact under any partitioning, so the new
  *     centroids are bit-identical in any engine).
  *
  * Scale shape per iteration: one crossJoin against the BROADCAST k-row
  * centroid frame with a codegen'd zip_with/aggregate distance (no UDF),
  * one min_by hash agg for assignment, one posexplode + (cluster, dim)
  * hash agg for the new means — work is O(n·k·dim) scan-side compute,
  * shuffles only the (cluster, dim) frame. The driver loop only builds
  * the plan; k and `iterations` are fixed query parameters.
  */
object KMeans {

  /** Final assignment after `iterations` Lloyd rounds:
    * `(idCol, cluster, dist2)` — `dist2` the squared L2 distance to the
    * final centroid set. `iterations` counts ASSIGNMENT passes: means
    * recompute between passes, not after the last.
    */
  def assign(
      vecs: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iterations: Int): DataFrame =
    fit(vecs, idCol, vecCol, k, iterations)._1.select(
      col("__id").as(idCol),
      col("__c").cast("int").as("cluster"),
      col("__d").as("dist2"))

  /** The centroid set the FINAL assignment pass used (means after
    * `iterations − 1` recomputes): `(cluster, centroid)` — the model to
    * ship to a scoring path (e.g. a stateless stream scorer) so online
    * assignments agree with the batch clustering exactly.
    */
  def centroidsUsed(
      vecs: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iterations: Int): DataFrame =
    fit(vecs, idCol, vecCol, k, iterations)._2.select(
      col("__c").cast("int").as("cluster"),
      col("__cv").as("centroid"))

  private def fit(
      vecs: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iterations: Int): (DataFrame, DataFrame) = {
    require(k >= 1, "k must be >= 1")
    require(iterations >= 1, "iterations must be >= 1")
    val v = vecs.select(
      col(idCol).as("__id"),
      transform(col(vecCol), x => x.cast("double")).as("__v"))
    var centroids = v.orderBy("__id").limit(k)
      .select(
        (row_number().over(Window.orderBy("__id")) - 1).as("__c"),
        col("__v").as("__cv"))
    var assigned: DataFrame = null
    for (it <- 1 to iterations) {
      val dists = v.crossJoin(broadcast(centroids))
        .withColumn("__d",
          aggregate(
            zip_with(col("__v"), col("__cv"), (a, b) => (a - b) * (a - b)),
            lit(0.0), (acc, x) => acc + x))
      assigned = dists
        .groupBy(col("__id"))
        .agg(min_by(
          struct(col("__c"), col("__v"), col("__d")),
          struct(round(col("__d"), 6).as("d6"), col("__c"))).as("__best"))
        .select(
          col("__id"),
          col("__best.__c").as("__c"),
          col("__best.__v").as("__v"),
          col("__best.__d").as("__d"))
      if (it < iterations) {
        centroids = assigned
          .select(col("__c"), posexplode(col("__v")).as(Seq("__p", "__x")))
          .groupBy(col("__c"), col("__p"))
          .agg((sum(col("__x").cast("decimal(20,10)")).cast("double") /
            count(lit(1))).as("__m"))
          .groupBy(col("__c"))
          .agg(sort_array(collect_list(struct(col("__p"), col("__m")))).as("__pm"))
          .select(
            col("__c"),
            transform(col("__pm"), s => s.getField("__m")).as("__cv"))
      }
    }
    (assigned, centroids)
  }

  /** Per-cluster summary of [[assign]]: `(cluster, n_vecs, inertia)` —
    * the convergence/quality scoreboard (inertia = Σ dist2).
    */
  def clusterSummary(
      vecs: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iterations: Int): DataFrame =
    assign(vecs, idCol, vecCol, k, iterations)
      .groupBy(col("cluster"))
      .agg(
        count(lit(1)).cast("int").as("n_vecs"),
        sum(col("dist2")).as("inertia"))
      .orderBy("cluster")

  /** Clustering-quality scoreboard — the "is k right?" readout run before
    * committing to a cluster-based curation or IVF partitioning:
    *
    *   - centroid-simplified SILHOUETTE (the O(n·k) form of Rousseeuw
    *     1987 — a = distance to own centroid, b = nearest other centroid;
    *     the O(n²) pairwise form is not a 100 TB operator),
    *   - DAVIES–BOULDIN index (Davies & Bouldin 1979):
    *     mean over clusters of max_j (S_i + S_j) / M_ij, S = mean
    *     intra-centroid distance, M = centroid separation.
    *
    * Output one row per surviving cluster: (cluster, n_vecs,
    * mean_silhouette, s_intra, davies_bouldin) — the DB index repeated
    * per row (it is a global scalar; the per-cluster rows carry its
    * ingredients). Silhouette of a point with no other cluster (k = 1)
    * is 0 by convention — handled explicitly because greatest() SKIPS
    * nulls. Irrational sqrt means ship ROUNDED to 6 decimals (the q_t30
    * rule); the DB ratio uses the unrounded means and rounds once.
    *
    * Shape at scale: one broadcast cross of points × k centroids (the
    * [[assign]] shape), one per-point aggregate, one k-row aggregate;
    * the k×k centroid-pair frame never leaves the executors.
    */
  def clusteringQuality(
      vecs: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iterations: Int): DataFrame = {
    val (assigned, centroids) = fit(vecs, idCol, vecCol, k, iterations)
    val d = assigned.select(col("__id"), col("__c").as("own"), col("__v"))
      .crossJoin(broadcast(centroids))
      .withColumn("dist", sqrt(aggregate(
        zip_with(col("__v"), col("__cv"), (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, x) => acc + x)))
    val ab = d.groupBy(col("__id"), col("own"))
      .agg(
        max(when(col("__c") === col("own"), col("dist"))).as("a"),
        min(when(col("__c") =!= col("own"), col("dist"))).as("b"))
    val sil = ab.withColumn("s",
      when(col("b").isNull, lit(0.0))
        .when(greatest(col("a"), col("b")) > 0,
          (col("b") - col("a")) / greatest(col("a"), col("b")))
        .otherwise(lit(0.0)))
    // cross-row folds as exact DECIMAL sums (the fit() centroid idiom):
    // a raw double avg() is partition-order-dependent and can flip the
    // round(.,6) gate on a near-half-ulp boundary
    val perCluster = sil.groupBy(col("own").cast("int").as("cluster"))
      .agg(
        count(lit(1)).cast("int").as("n_vecs"),
        round(sum(col("s").cast("decimal(20,10)")).cast("double") /
          count(lit(1)), 6).as("mean_silhouette"),
        round(sum(col("a").cast("decimal(20,10)")).cast("double") /
          count(lit(1)), 6).as("s_intra"),
        (sum(col("a").cast("decimal(20,10)")).cast("double") /
          count(lit(1))).as("__s_raw"))
    val cpos = centroids.select(col("__c"), posexplode(col("__cv")).as(Seq("__p", "__m")))
    val cdist = cpos.as("x").join(cpos.as("y"),
        col("x.__p") === col("y.__p") && col("x.__c") =!= col("y.__c"))
      .groupBy(col("x.__c").cast("int").as("ci"), col("y.__c").cast("int").as("cj"))
      .agg(sqrt(sum(((col("x.__m") - col("y.__m")) * (col("x.__m") - col("y.__m")))
        .cast("decimal(30,15)")).cast("double")).as("m"))
    val dbPer = cdist
      .join(perCluster.select(col("cluster").as("ci"), col("__s_raw").as("si")), Seq("ci"))
      .join(perCluster.select(col("cluster").as("cj"), col("__s_raw").as("sj")), Seq("cj"))
      .groupBy(col("ci"))
      .agg(max(when(col("m") > 0, (col("si") + col("sj")) / col("m"))).as("r"))
    val db = dbPer.agg(round(
      sum(col("r").cast("decimal(30,15)")).cast("double") / count(lit(1)), 6)
      .as("davies_bouldin"))
    perCluster.drop("__s_raw").crossJoin(db).orderBy("cluster")
  }
}
