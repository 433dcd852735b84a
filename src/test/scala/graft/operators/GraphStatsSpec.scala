package graft.operators

import graft.SparkSpec

class GraphStatsSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)]) =
    GraphStats.degreeAssortativity(edges.toDF("s", "d"), "s", "d")
      .collect().head

  test("path of 3 is perfectly disassortative (r = -1)") {
    val r = run(Seq((1L, 2L), (2L, 3L)))
    assert(r.getLong(0) === 3 && r.getLong(1) === 2)
    assert(math.abs(r.getDouble(2) - (-1.0)) < 1e-12)
  }

  test("star: every edge pairs degree 1 with degree n-1 → r = -1") {
    val r = run((2L to 7L).map(i => (1L, i)))
    assert(math.abs(r.getDouble(2) - (-1.0)) < 1e-12)
  }

  test("regular graph (K3): zero degree variance → NULL, not a throw") {
    val r = run(Seq((1L, 2L), (2L, 3L), (1L, 3L)))
    assert(r.getLong(0) === 3 && r.getLong(1) === 3)
    assert(r.isNullAt(2))
  }

  test("duplicates, reversed direction, and self-loops canonicalize away") {
    val r = run(Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L), (2L, 3L)))
    assert(r.getLong(0) === 3 && r.getLong(1) === 2, "one path of 3 remains")
    assert(math.abs(r.getDouble(2) - (-1.0)) < 1e-12)
  }
}
