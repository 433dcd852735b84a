package graft.operators

import graft.SparkSpec

class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  private val nameW = Seq(6.0, 4.0, 2.0)
  private val fieldW = Seq(("nat", 1.5, -1.0), ("seg", 1.0, -0.5))

  test("scored pairs: name distance steps the weight, fields add literal log-odds") {
    val records = Seq(
      (1L, "anna", 7, "X"),
      (2L, "anne", 7, "X"), //  dist 1, both fields agree → 4 + 1.5 + 1 = 6.5
      (3L, "anna", 9, "Y"), //  dist 0 vs 1, both disagree → 6 − 1 − 0.5 = 4.5
      (4L, "bob", 7, "X")) //   name unreachable (dist 3)
      .toDF("id", "name", "nat", "seg")
    val pairs = EntityResolution.matchedPairs(
        records, "id", "name", nameW, fieldW, maxNameDist = 2, minScore = 5.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSet
    assert(pairs === Set((1L, 2L, 6.5)))
    // threshold at 4.0 admits the same-name different-fields pair too
    val loose = EntityResolution.matchedPairs(
        records, "id", "name", nameW, fieldW, maxNameDist = 2, minScore = 4.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(loose === Set((1L, 2L), (1L, 3L)))
  }

  test("resolve: transitive closure assigns min-id entities; singletons stay themselves") {
    // 1–2 linked, 2–5 linked (chain), 3/4 singletons → {1,2,5} share entity 1
    val records = Seq(
      (1L, "anna", 7, "X"),
      (2L, "anne", 7, "X"),
      (5L, "annf", 7, "X"), // dist("anne","annf") = 1; dist("anna","annf") = 1 too
      (3L, "carol", 9, "Y"),
      (4L, "bob", 7, "X"))
      .toDF("id", "name", "nat", "seg")
    val got = EntityResolution.resolve(
        records, "id", "name", nameW, fieldW, maxNameDist = 2, minScore = 5.0)
      .select("id", "entity_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 3L -> 3L, 4L -> 4L))
  }

  test("blocking: lossy weight configurations are rejected, lossless ones match unblocked") {
    // With nat disagree = -1.0 a cross-nation pair can reach
    // 6.0 - 1.0 + 1.0 = 6.0 >= 5.0 — blocking on nat would drop it.
    val records = Seq(
      (1L, "anna", 7, "X"),
      (2L, "anne", 7, "X"),
      (3L, "anna", 9, "X"), // cross-nation dist-0 pair vs 1
      (4L, "bob", 8, "X"))
      .toDF("id", "name", "nat", "seg")
    val ex = intercept[IllegalArgumentException] {
      EntityResolution.matchedPairs(
        records, "id", "name", nameW, fieldW, maxNameDist = 2, minScore = 5.0,
        blockCol = Some("nat"))
    }
    assert(ex.getMessage.contains("LOSSY"))
    // Steepening the disagree weight to -3.0 caps cross-nation at 4.0 < 5.0:
    // blocking is provably lossless and must reproduce the unblocked pairs.
    val steep = Seq(("nat", 1.5, -3.0), ("seg", 1.0, -0.5))
    def pairSet(block: Option[String]) = EntityResolution.matchedPairs(
        records, "id", "name", nameW, steep, maxNameDist = 2, minScore = 5.0,
        blockCol = block)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSet
    val unblocked = pairSet(None)
    assert(unblocked === Set((1L, 2L, 6.5)))
    assert(pairSet(Some("nat")) === unblocked)
  }

  test("identical-name duplicate records pair at distance 0") {
    val records = Seq(
      (1L, "same", 7, "X"),
      (9L, "same", 7, "X"))
      .toDF("id", "name", "nat", "seg")
    val pairs = EntityResolution.matchedPairs(
        records, "id", "name", nameW, fieldW, maxNameDist = 2, minScore = 5.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(pairs.toSeq === Seq((1L, 9L, 0, 8.5)))
  }
}
