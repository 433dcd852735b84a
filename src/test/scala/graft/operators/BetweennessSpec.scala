package graft.operators

import graft.SparkSpec

class BetweennessSpec extends SparkSpec {
  import spark.implicits._

  private def bc(edges: Seq[(Long, Long)], pivots: Int, depth: Int): Map[Long, Double] =
    Betweenness.pivotBetweenness(
      edges.toDF("a", "b"), "a", "b", numPivots = pivots, maxDepth = depth)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("path graph, all pivots: classic ordered-pair betweenness") {
    // 1-2-3-4-5: summing delta over ALL sources counts each unordered
    // pair twice -> node2: 6, node3: 8, node4: 6, endpoints 0
    val got = bc(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)), pivots = 5, depth = 4)
    assert(got === Map(1L -> 0.0, 2L -> 6.0, 3L -> 8.0, 4L -> 6.0, 5L -> 0.0))
  }

  test("square graph: sigma = 2 splits dependency evenly") {
    // 1-2, 1-3, 2-4, 3-4: every s-t pair at distance 2 has two shortest
    // paths, so each intermediate carries 1/2 per source; all nodes 1.0
    val got = bc(Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)), pivots = 4, depth = 3)
    assert(got === Map(1L -> 1.0, 2L -> 1.0, 3L -> 1.0, 4L -> 1.0))
  }

  test("single pivot: exactly delta from the smallest node id") {
    // pivot = 1 on the path: delta_1 = (3, 2, 1, 0) down the chain
    val got = bc(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)), pivots = 1, depth = 4)
    assert(got === Map(1L -> 0.0, 2L -> 3.0, 3L -> 2.0, 4L -> 1.0, 5L -> 0.0))
  }

  test("depth bound truncates long paths; exhaustion stops early") {
    // depth 2 on the path: only length-2 paths count -> node2 gets
    // s=1(t=3) + s=3(t=1) = 2, same for 3 and 4
    val got = bc(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)), pivots = 5, depth = 2)
    assert(got === Map(1L -> 0.0, 2L -> 2.0, 3L -> 2.0, 4L -> 2.0, 5L -> 0.0))
    // depth far beyond the diameter: BFS exhausts, result identical to depth=4
    val deep = bc(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)), pivots = 5, depth = 10)
    assert(deep === Map(1L -> 0.0, 2L -> 6.0, 3L -> 8.0, 4L -> 6.0, 5L -> 0.0))
  }

  private def hc(edges: Seq[(Long, Long)], pivots: Int, depth: Int): Map[Long, Double] =
    Betweenness.harmonicCentrality(
      edges.toDF("a", "b"), "a", "b", numPivots = pivots, maxDepth = depth)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("harmonic centrality: path graph hand values; depth truncation") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val got = hc(path, pivots = 5, depth = 4)
    assert(got === Map(
      1L -> 2.083333, 2L -> 2.833333, 3L -> 3.0, 4L -> 2.833333, 5L -> 2.083333))
    // depth 1: only direct neighbors count
    val d1 = hc(path, pivots = 5, depth = 1)
    assert(d1 === Map(1L -> 1.0, 2L -> 2.0, 3L -> 2.0, 4L -> 2.0, 5L -> 1.0))
  }

  test("harmonic centrality: unreachable pairs contribute exactly zero") {
    val got = hc(Seq((1L, 2L), (10L, 11L)), pivots = 4, depth = 3)
    assert(got === Map(1L -> 1.0, 2L -> 1.0, 10L -> 1.0, 11L -> 1.0))
  }

  test("eccentricity: per-pivot horizons and the diameter lower bound") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val got = Betweenness.pivotEccentricity(
      path.toDF("a", "b"), "a", "b", numPivots = 2, maxDepth = 10)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === Map(1L -> ((4L, 5L, 4L)), 2L -> ((3L, 5L, 4L))))
    // depth truncation caps the horizon AND the reach
    val cut = Betweenness.pivotEccentricity(
      path.toDF("a", "b"), "a", "b", numPivots = 2, maxDepth = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(cut === Map(1L -> ((2L, 3L, 2L)), 2L -> ((2L, 4L, 2L))))
  }

  test("disconnected component: unreachable nodes contribute and receive nothing") {
    val got = bc(Seq((1L, 2L), (2L, 3L), (10L, 11L)), pivots = 3, depth = 4)
    // pivots are 1, 2, 3 (smallest ids); node 2 carries s=1(t=3)+s=3(t=1)
    assert(got === Map(1L -> 0.0, 2L -> 2.0, 3L -> 0.0, 10L -> 0.0, 11L -> 0.0))
  }
}
