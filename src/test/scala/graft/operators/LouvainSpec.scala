package graft.operators

import graft.SparkSpec

class LouvainSpec extends SparkSpec {
  import spark.implicits._

  // Two triangles {1,2,3} and {4,5,6} joined by the bridge 3-4 (m = 7).
  private val edges = Seq(
    (1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
    .toDF("a", "b")

  private def refine(assign: Seq[(Long, Long)]) =
    Louvain.bestMoveRefinement(
      edges, "a", "b", assign.toDF("node", "community"), "node", "community")

  test("misassigned node moves home with the hand-computed integer gain") {
    // node 3 wrongly in the right community: ΔQ·4m² = 4·7·(2−1) − 2·3·(4−10+3) = 46
    val rows = refine(Seq(
      1L -> 10L, 2L -> 10L, 3L -> 20L, 4L -> 20L, 5L -> 20L, 6L -> 20L)).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getAs[Long]("moved_node") === 3L)
    assert(r.getAs[Long]("from_label") === 20L)
    assert(r.getAs[Long]("to_label") === 10L)
    assert(r.getAs[Long]("gain_x4m2") === 46L)
    assert(r.getAs[Long]("n_edges") === 7L)
    assert(r.getAs[Long]("intra_before") === 5L)
    assert(r.getAs[Long]("sum_deg_sq_before") === 116L)
    assert(r.getAs[Long]("intra_after") === 6L)
    assert(r.getAs[Long]("sum_deg_sq_after") === 98L)
    val qb = r.getAs[Double]("modularity_before")
    val qa = r.getAs[Double]("modularity_after")
    assert(math.abs(qb - (5.0 / 7 - 116.0 / 196)) < 1e-12)
    assert(math.abs(qa - (6.0 / 7 - 98.0 / 196)) < 1e-12)
    // the recomputed delta equals the predicted gain / 4m²
    assert(math.abs((qa - qb) - 46.0 / 196) < 1e-12)
  }

  test("a local-move-optimal assignment yields no move (empty result)") {
    val rows = refine(Seq(
      1L -> 10L, 2L -> 10L, 3L -> 10L, 4L -> 20L, 5L -> 20L, 6L -> 20L)).collect()
    assert(rows.isEmpty)
  }

  test("gain ties break on (node, target): smallest node wins") {
    // one edge, two singleton communities: either endpoint moving to the
    // other side gains exactly 2 — the argmax must pick node 1 → 20
    val e = Seq((1L, 2L)).toDF("a", "b")
    val out = Louvain.bestMoveRefinement(
      e, "a", "b",
      Seq(1L -> 10L, 2L -> 20L).toDF("node", "community"),
      "node", "community").collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("moved_node") === 1L)
    assert(out.head.getAs[Long]("to_label") === 20L)
    assert(out.head.getAs[Long]("gain_x4m2") === 2L)
    assert(out.head.getAs[Double]("modularity_before") === -0.5)
    assert(out.head.getAs[Double]("modularity_after") === 0.0)
  }
}
