package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence mining: which items appear together in the
  * same basket, how often, and with what lift over independence — the
  * degenerate-but-useful end of association-rule mining (pair support +
  * lift; no candidate lattice). On a corpus, "basket" is a document and
  * "item" a tag/entity; on the TPC-H shape it is parts co-ordered in one
  * order.
  *
  * Beyond-reference surface (the reference moves rows; it never mines
  * relationships), added for the data-curation side: co-occurrence is the
  * standard first look at topic/tag structure before mixture weighting.
  *
  * Shape at scale: baskets are deduplicated to (basket, item) grain, then
  * self-joined ON THE BASKET KEY — both sides hash-partition on the same
  * key, and Catalyst reuses the single exchange (`ReusedExchange`) since
  * both sides are the same plan. Pair counting is one hash aggregate on
  * (p1, p2); per-item frequencies and the basket total fold from already
  * reduced frames. The `p1 < p2` guard keeps each unordered pair once and
  * drops self-pairs BEFORE the aggregate, so a basket with b items emits
  * b·(b−1)/2 pair rows — bound b (cap basket size upstream) and the join
  * output is linear in baskets. Top-k is `TakeOrderedAndProject` (per
  * partition heads + driver merge of k rows), never a full sort.
  */
object Association {

  /** Top-k co-occurring item pairs by pair support: (p1, p2, pair_count,
    * lift) with lift = support(p1,p2) · N / (support(p1) · support(p2))
    * over N distinct baskets. Ties break on (p1, p2) so the cut is total.
    */
  def coOccurrenceTopK(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    // Partition by the BASKET key alone before the (basket, item) dedup:
    // HashPartitioning(__b) satisfies the dedup's ClusteredDistribution
    // on (__b, __i), the same exchange then serves BOTH self-join sides
    // (ReusedExchange — the projections differ only above it), and the
    // join itself needs no further shuffle.
    val items = df.select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .repartition(col("__b"))
      .distinct()
    val freq = items.groupBy(col("__i")).agg(count(lit(1)).as("__ci"))
    val total = items.agg(count_distinct(col("__b")).as("__nb"))
    val pairs = items.select(col("__b"), col("__i").as("p1"))
      .join(items.select(col("__b"), col("__i").as("p2")), Seq("__b"))
      .filter(col("p1") < col("p2"))
      .groupBy("p1", "p2")
      .agg(count(lit(1)).as("pair_count"))
    // Cut to k rows FIRST (TakeOrderedAndProject), then decorate with
    // lift — the frequency joins touch k rows, not every pair, and the
    // k-row side broadcasts into the (possibly vocabulary-sized) freq.
    pairs
      .orderBy(col("pair_count").desc, col("p1"), col("p2"))
      .limit(k)
      .join(freq.select(col("__i").as("p1"), col("__ci").as("__c1")), Seq("p1"))
      .join(freq.select(col("__i").as("p2"), col("__ci").as("__c2")), Seq("p2"))
      .crossJoin(broadcast(total))
      .select(
        col("p1"), col("p2"), col("pair_count"),
        (col("pair_count").cast("double") * col("__nb") / col("__c1") / col("__c2"))
          .as("lift"))
      .orderBy(col("pair_count").desc, col("p1"), col("p2"))
  }

  /** Top-k item pairs by COSINE similarity over the binary basket-item
    * incidence: cos(i,j) = c_ij / √(c_i · c_j) — the item-item
    * collaborative-filtering score, which normalizes away item
    * popularity where raw pair support (and to a lesser degree lift)
    * rewards it. `minCount` drops noise pairs before the frequency
    * joins. Unlike [[coOccurrenceTopK]] the cut runs AFTER the cosine is
    * known (the rank key needs both frequencies), but the frequency
    * frame is vocabulary-sized — it broadcasts, the pair frame never
    * reshuffles, and the cut is still TakeOrderedAndProject. √ is
    * IEEE-correctly-rounded (unlike pow/exp), so equal-cosine ties are
    * bit-equal in any engine and the (cosine DESC, p1, p2) order is
    * total.
    */
  def itemCosineTopK(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      k: Int,
      minCount: Long = 1L): DataFrame = {
    require(k > 0, "k must be positive")
    val items = df.select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .repartition(col("__b"))
      .distinct()
    val freq = items.groupBy(col("__i")).agg(count(lit(1)).as("__ci"))
    val pairs = items.select(col("__b"), col("__i").as("p1"))
      .join(items.select(col("__b"), col("__i").as("p2")), Seq("__b"))
      .filter(col("p1") < col("p2"))
      .groupBy("p1", "p2")
      .agg(count(lit(1)).as("pair_count"))
      .filter(col("pair_count") >= minCount)
    pairs
      .join(broadcast(freq.select(col("__i").as("p1"), col("__ci").as("__c1"))), Seq("p1"))
      .join(broadcast(freq.select(col("__i").as("p2"), col("__ci").as("__c2"))), Seq("p2"))
      .select(
        col("p1"), col("p2"), col("pair_count"),
        (col("pair_count").cast("double") /
          sqrt(col("__c1").cast("double") * col("__c2"))).as("cosine"))
      .orderBy(col("cosine").desc, col("p1"), col("p2"))
      .limit(k)
  }
}
