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

  test("frequency scoring: rare-value agreement outweighs common-value agreement") {
    // city 'smallville' appears 2/8 times, 'metropolis' 6/8: identical
    // name evidence, but the rare-city pair scores log2(0.9/0.25)=1.848
    // above the common-city pair's log2(0.9/0.75)=0.263
    val records = Seq(
      (1L, "anna", "smallville"), (2L, "anne", "smallville"),
      (3L, "carl", "metropolis"), (4L, "carla", "metropolis"),
      (5L, "dave", "metropolis"), (6L, "erin", "metropolis"),
      (7L, "fred", "metropolis"), (8L, "gina", "metropolis"))
      .toDF("id", "name", "city")
    def pairsAt(min: Double) = EntityResolution.frequencyScoredPairs(
        records, "id", "name", Seq(6.0, 4.0), Seq(("city", 0.9, -2.0, 5.0)),
        maxNameDist = 1, minScore = min)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSet

    val w_rare = math.log(0.9 / 0.25) / math.log(2.0)
    val w_common = math.log(0.9 / 0.75) / math.log(2.0)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // threshold between the two: only the rare-city pair survives
    val mid = (4.0 + w_rare + 4.0 + w_common) / 2
    assert(pairsAt(mid) === Set((1L, 2L, r6(4.0 + w_rare))))
    // low threshold admits both dist-1 pairs with the expected weights
    assert(pairsAt(4.0) ===
      Set((1L, 2L, r6(4.0 + w_rare)), (3L, 4L, r6(4.0 + w_common))))
  }

  test("frequency scoring: the cap binds on singleton values; disagreement stays literal") {
    // 'x' appears twice in 10 records: uncapped weight log2(0.9/0.2)=2.17,
    // cap 1.5 must bind. A disagreeing pair gets the literal -2.0.
    // filler names repeat their index so any two differ at ≥2 positions
    val records = (Seq((1L, "anna", "x"), (2L, "anne", "x"), (3L, "anny", "boa")) ++
      (4L to 10L).map(i => (i, s"filler${i}xyz$i", "boa"))).toDF("id", "name", "city")
    val pairs = EntityResolution.frequencyScoredPairs(
        records, "id", "name", Seq(6.0, 4.0), Seq(("city", 0.9, -2.0, 1.5)),
        maxNameDist = 1, minScore = -10.0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    // 1-2: dist1 agree + capped 1.5 = 5.5 (uncapped would be 6.17)
    assert(pairs((1L, 2L)) === 5.5)
    // 1-3 and 2-3: dist1 + literal disagreement -2.0 = 2.0
    assert(pairs((1L, 3L)) === 2.0)
    assert(pairs((2L, 3L)) === 2.0)
    assert(pairs.size === 3)
  }

  test("frequency blocking: lossless assertion uses the caps, lossy configs rejected") {
    // nat 7 and seg X are rare (2/8 each) so the 1-2 pair clears 5.5:
    // 4.0 + min(log2(.9/.25), 4) + min(log2(.9/.25), 2) = 4 + 1.848 + 1.848
    val records = (Seq(
      (1L, "anna", 7, "X"), (2L, "anne", 7, "X"), (3L, "anny", 9, "Y")) ++
      (4L to 8L).map(i => (i, s"filler${i}xyz$i", 10 + i.toInt, "Y")))
      .toDF("id", "name", "nat", "seg")
    // best cross-nat score = 6.0 + (-3.0) + cap(2.0) = 5.0 >= 4.9 → lossy
    assertThrows[IllegalArgumentException] {
      EntityResolution.frequencyScoredPairs(
        records, "id", "name", Seq(6.0, 4.0),
        Seq(("nat", 0.9, -3.0, 4.0), ("seg", 0.9, -0.5, 2.0)),
        maxNameDist = 1, minScore = 4.9, blockCol = Some("nat"))
    }
    // raising the threshold to 5.5 makes the same blocking provably safe,
    // and blocked output equals unblocked output
    val blocked = EntityResolution.frequencyScoredPairs(
        records, "id", "name", Seq(6.0, 4.0),
        Seq(("nat", 0.9, -3.0, 4.0), ("seg", 0.9, -0.5, 2.0)),
        maxNameDist = 1, minScore = 5.5, blockCol = Some("nat"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSet
    val unblocked = EntityResolution.frequencyScoredPairs(
        records, "id", "name", Seq(6.0, 4.0),
        Seq(("nat", 0.9, -3.0, 4.0), ("seg", 0.9, -0.5, 2.0)),
        maxNameDist = 1, minScore = 5.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSet
    assert(blocked === unblocked && blocked.nonEmpty)
  }
}
