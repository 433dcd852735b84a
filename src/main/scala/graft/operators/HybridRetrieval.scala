package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval fusion: combine per-system rankings (lexical BM25,
  * vector cosine, …) with Reciprocal Rank Fusion (Cormack et al. 2009):
  * `rrf(d) = Σ_systems 1 / (k0 + rank_s(d))`. RRF is the standard
  * score-free fusion — it needs no cross-system score calibration,
  * which is what makes it both robust in practice and EXACTLY
  * gateable: every fused value derives from integer ranks, so two
  * engines agree bit-for-bit (fusing raw scores would stack two
  * libm-sensitive sums).
  *
  * Scale shape: each system's ranking is a TakeOrderedAndProject cut to
  * `topN` (global top-k, never a global sort) followed by a window over
  * the ≤topN surviving rows — bounded, single-task by construction and
  * fine BECAUSE it is bounded. The fusion is one union + one hash
  * aggregate over ≤ Σ topN rows.
  */
object HybridRetrieval {

  /** Top-`topN` rows of `scored` ranked 1.. by `round(scoreCol, 6)`
    * descending with ascending-id ties (the cross-engine argmax
    * discipline — raw-double ordering can flip on last-bit differences).
    * Output: (idCol, rank).
    */
  def rankTopN(
      scored: DataFrame,
      idCol: String,
      scoreCol: String,
      topN: Int): DataFrame = {
    require(topN >= 1, "topN must be >= 1")
    val cut = scored
      .select(col(idCol), round(col(scoreCol), 6).as("__s"))
      .where(col("__s").isNotNull)
      .orderBy(col("__s").desc, col(idCol))
      .limit(topN)
    // the window runs over ≤ topN rows (post-cut) — bounded by design
    val w = Window.orderBy(col("__s").desc, col(idCol))
    cut.select(col(idCol), row_number().over(w).as("rank"))
  }

  /** RRF-fuse rankings (each `(idCol, rank)`). With two systems the
    * fused sum is order-independent in IEEE (binary addition is
    * commutative); with 3+ the grouped sum's order is engine-internal —
    * round before comparing across engines. Output:
    * (idCol, n_systems, rrf).
    */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, k0: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(k0 >= 1, "k0 must be >= 1")
    rankings
      .map(_.select(col(idCol), col("rank")))
      .reduce(_ unionByName _)
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).cast("int").as("n_systems"),
        sum(lit(1.0) / (lit(k0) + col("rank"))).as("rrf"))
  }
}
