package graft.operators

import graft.SparkSpec

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def stats(edges: Seq[(Long, Long)]) = {
    val r = Triangles.globalStats(edges.toDF("s", "t"), "s", "t").collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
  }

  test("K4: four triangles, clustering 1.0") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    assert(stats(k4) === ((4L, 6L, 12L, 4L, 1.0)))
  }

  test("path graph has wedges but no triangles") {
    val (n, e, w, t, c) = stats(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    assert((n, e, w, t) === ((4L, 3L, 2L, 0L)))
    assert(c === 0.0)
  }

  test("duplicates, reversed direction, and self-loops canonicalize away") {
    val messy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 1L), (2L, 3L))
    assert(stats(messy) === ((3L, 3L, 3L, 1L, 1.0)))
  }

  test("star graph: hub degree n-1, zero triangles — orientation bounds wedges") {
    val star = (2L to 30L).map(i => (1L, i))
    val (n, e, w, t, _) = stats(star)
    assert((n, e, t) === ((30L, 29L, 0L)))
    assert(w === 29L * 28 / 2, "all wedges centered on the hub")
  }
}
