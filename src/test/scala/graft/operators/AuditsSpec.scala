package graft.operators

import graft.SparkSpec

class AuditsSpec extends SparkSpec {
  import spark.implicits._

  test("hllIntersection: hand-computed exact counts; sketch exact at low cardinality") {
    val rows = Seq(
      ("A", 1L), ("A", 2L), ("A", 3L), ("A", 3L), // dup within slice
      ("B", 3L), ("B", 4L),
      ("C", 9L)) // other slice ignored
      .toDF("slice", "k")
    val r = Audits.hllIntersection(rows, "slice", "k", "A", "B").head()
    assert(r.getString(0) === "A" && r.getString(1) === "B")
    assert(r.getLong(2) === 3L && r.getLong(3) === 2L)
    assert(r.getLong(4) === 4L && r.getLong(5) === 1L)
    // HLL is exact in sparse mode at these cardinalities → bound holds
    assert(r.getBoolean(6))
  }

  test("hllIntersection: disjoint slices give intersection 0") {
    val rows = Seq(("A", 1L), ("A", 2L), ("B", 3L), ("B", 4L)).toDF("slice", "k")
    val r = Audits.hllIntersection(rows, "slice", "k", "A", "B").head()
    assert(r.getLong(5) === 0L && r.getLong(4) === 4L && r.getBoolean(6))
  }
}
