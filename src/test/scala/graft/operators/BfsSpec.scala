package graft.operators

import graft.SparkSpec

class BfsSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], src: Long, cap: Int = 30) =
    Bfs.hops(edges.toDF("a", "b"), "a", "b", src, cap)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("path graph: hop = distance; direction of edge rows is irrelevant") {
    // 1-2-3-4 written with mixed orientation
    val got = run(Seq((1L, 2L), (3L, 2L), (3L, 4L)), src = 1L)
    assert(got === Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3))
  }

  test("cycle takes the shorter side; disconnected component absent") {
    // square 1-2-3-4-1 → node 3 at hop 2 (two equal paths), plus island 8-9
    val got = run(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (8L, 9L)), src = 1L)
    assert(got === Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 1))
  }

  test("maxHops caps the frontier; source absent from edges maps alone") {
    val got = run(Seq((1L, 2L), (2L, 3L), (3L, 4L)), src = 1L, cap = 2)
    assert(got === Map(1L -> 0, 2L -> 1, 3L -> 2))
    assert(run(Seq((5L, 6L)), src = 1L) === Map(1L -> 0))
  }

  test("duplicate edge rows (either orientation) leave distances unchanged") {
    val got = run(Seq((1L, 2L), (1L, 2L), (2L, 1L), (2L, 3L), (2L, 3L)), src = 1L)
    assert(got === Map(1L -> 0, 2L -> 1, 3L -> 2))
  }
}
