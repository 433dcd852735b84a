package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def clusters(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.minLabelPropagation(pairs.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def starClusters(
      pairs: Seq[(Long, Long)], maxIter: Int = 30): Map[Long, Long] =
    ConnectedComponents.alternatingStar(pairs.toDF("id_a", "id_b"), maxIter)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Brute-force union-find for cross-checking. */
  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val ids = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    // min id per root, then label every member with it
    val byRoot = ids.groupBy(find)
    byRoot.flatMap { case (_, members) =>
      val m = members.min
      members.map(_ -> m)
    }
  }

  test("chain graph collapses to one component (diameter > 1 ⇒ needs iteration)") {
    val got = clusters(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("disjoint components keep separate min labels") {
    val got = clusters(Seq((5L, 3L), (3L, 9L), (20L, 30L)))
    assert(got === Map(3L -> 3L, 5L -> 3L, 9L -> 3L, 20L -> 20L, 30L -> 20L))
  }

  test("transitive (a,c),(b,c) case: CC keeps one doc where pairwise policy keeps two") {
    val docs = Seq(1L, 2L, 3L, 4L).toDF("doc_id")
    val pairs = Seq((1L, 3L), (2L, 3L)).toDF("id_a", "id_b")
    val pairwise = NearDup.dropDuplicatesByPairs(docs, "doc_id", pairs)
      .collect().map(_.getLong(0)).toSet
    val transitive = ConnectedComponents.dedupByComponents(docs, "doc_id", pairs)
      .collect().map(_.getLong(0)).toSet
    assert(pairwise === Set(1L, 2L, 4L)) // 2 survives: never on a pair's b-side
    assert(transitive === Set(1L, 4L))   // {1,2,3} is one cluster → keep 1
  }

  test("random graphs agree with brute-force union-find") {
    val rnd = new Random(7)
    (1 to 3).foreach { _ =>
      val pairs = Seq.fill(40)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
        .filter(p => p._1 != p._2)
        .map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
        .distinct
      assert(clusters(pairs) === unionFind(pairs))
    }
  }

  test("alternatingStar agrees with minLabelPropagation and union-find on random graphs") {
    val rnd = new Random(11)
    (1 to 3).foreach { _ =>
      val pairs = Seq.fill(40)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
        .filter(p => p._1 != p._2)
        .map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
        .distinct
      assert(starClusters(pairs) === unionFind(pairs))
    }
  }

  test("alternatingStar converges on a long chain within polylog rounds " +
    "(diameter 63 would blow minLabelPropagation's default bound)") {
    // path 0-1-2-…-63: diameter 63; star-halving needs ~log²(n) rounds
    val chain = (0L until 63L).map(i => (i, i + 1))
    val got = starClusters(chain, maxIter = 15)
    assert(got === (0L to 63L).map(_ -> 0L).toMap)
  }

  test("alternatingStar handles duplicate/reversed pairs and empty input") {
    assert(starClusters(Seq((2L, 1L), (1L, 2L), (2L, 1L))) === Map(1L -> 1L, 2L -> 1L))
    assert(starClusters(Seq.empty[(Long, Long)]) === Map.empty)
  }

  test("assignClusters labels pair members with the component min, singletons with themselves") {
    val docs = Seq(1L, 2L, 3L, 10L).toDF("doc_id")
    val pairs = Seq((2L, 3L)).toDF("id_a", "id_b")
    val got = ConnectedComponents.assignClusters(docs, "doc_id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 10L -> 10L))
  }

  test("appendEdges: batch folds in ≡ full rebuild (merge, new nodes, no-op)") {
    import spark.implicits._
    val old = Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b")
    val base = ConnectedComponents.alternatingStar(old)
    // batch merges {1,2} with {3,4} via (2,3), adds fresh nodes {5,6},
    // and attaches 8 to the merged component via an OLD member
    val batch = Seq((2L, 3L), (5L, 6L), (8L, 1L)).toDF("id_a", "id_b")
    val got = ConnectedComponents.appendEdges(base, batch)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = ConnectedComponents
      .alternatingStar(old.unionByName(batch))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
    assert(got(8L) === 1L && got(4L) === 1L && got(6L) === 5L)
    // empty batch → labeling unchanged
    val none = ConnectedComponents
      .appendEdges(base, Seq.empty[(Long, Long)].toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(none === Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
  }

  test("appendEdges ≡ rebuild on a pseudo-random growing graph") {
    import spark.implicits._
    val rnd = new Random(7)
    val oldPairs = Seq.fill(60)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(p => p._1 != p._2)
    val batchPairs = Seq.fill(30)(
      (rnd.nextInt(70).toLong, rnd.nextInt(70).toLong))
      .filter(p => p._1 != p._2)
    val base = ConnectedComponents.alternatingStar(oldPairs.toDF("id_a", "id_b"))
    val got = ConnectedComponents
      .appendEdges(base, batchPairs.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = ConnectedComponents
      .alternatingStar((oldPairs ++ batchPairs).toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
  }

  test("representativesByScore keeps the best-scored member per cluster, ties to min id") {
    import org.apache.spark.sql.functions.col
    // cluster {1,2,3} via chained pairs: scores 5, 9, 9 → tie at 9 keeps id 2
    // singleton 4 keeps itself; cluster {5,6} with null scores vanishes
    val docs = Seq(
      (1L, Some(5.0)), (2L, Some(9.0)), (3L, Some(9.0)),
      (4L, Some(1.0)),
      (5L, None: Option[Double]), (6L, None: Option[Double]))
      .toDF("doc_id", "score")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val got = ConnectedComponents
      .representativesByScore(docs, "doc_id", pairs, col("score"))
      .select("doc_id", "cluster_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(2L -> 1L, 4L -> 4L))
  }
}
