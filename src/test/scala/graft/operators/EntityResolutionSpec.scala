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

  test("EM pattern weights: matches a driver-side reference EM on the pattern counts") {
    // three planted pair classes: exact duplicates (1,1,1), typo
    // duplicates (0,1,1), name coincidences across different people
    // (1,0,0) — EM must pull the first two toward the match class and
    // the third toward unmatch
    // doubled-index names: any two base names differ at >= 2 positions,
    // so the only dist<=1 pairs are the planted ones
    val base = (1L to 30L).map(i => (i, s"alpha${i}beta$i", (i % 5).toInt, s"s${i % 3}"))
    val exact = base.filter(_._1 % 3 == 0).map { case (i, n, a, s) =>
      (i + 100, n, a, s) }
    val typo = base.filter(_._1 % 4 == 0).map { case (i, n, a, s) =>
      (i + 200, n + "z", a, s) }
    val coinc = base.filter(_._1 % 5 == 0).map { case (i, n, a, s) =>
      (i + 300, n, (a + 1) % 5, "zz") }
    val recs = (base ++ exact ++ typo ++ coinc).toDF("id", "name", "nat", "seg")

    val got = EntityResolution.emPatternWeights(
        recs, "id", "name", Seq("nat", "seg"), maxNameDist = 1, iterations = 3)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) ->
        (r.getLong(3), r.getDouble(4), r.getDouble(5),
          (6 until 12).map(r.getDouble)))
      .toMap

    // reference: brute-force pattern counts, then 3 EM rounds with the
    // same 12-decimal posterior quantization
    val all = (base ++ exact ++ typo ++ coinc)
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val pats = (for {
      x <- all; y <- all if x._1 < y._1
      dist = lev(x._2, y._2) if dist <= 1
    } yield (if (dist == 0) 1 else 0, if (x._3 == y._3) 1 else 0,
      if (x._4 == y._4) 1 else 0))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    var lambda = 0.5
    var m = Array(0.9, 0.9, 0.9); var u = Array(0.1, 0.1, 0.1)
    def q12(x: Double) = BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    def post(p: (Int, Int, Int)): Double = {
      val gs = Seq(p._1, p._2, p._3)
      val pm = gs.zipWithIndex.foldLeft(lambda) { case (a, (g, i)) =>
        a * (if (g == 1) m(i) else 1 - m(i)) }
      val pu = gs.zipWithIndex.foldLeft(1 - lambda) { case (a, (g, i)) =>
        a * (if (g == 1) u(i) else 1 - u(i)) }
      pm / (pm + pu)
    }
    for (_ <- 1 to 3) {
      val ws = pats.map { case (p, c) => p -> q12(post(p)) }
      val sw = ws.map { case (p, w) => w * BigDecimal(pats(p)) }.sum
      val su = ws.map { case (p, w) => (BigDecimal(1) - w) * BigDecimal(pats(p)) }.sum
      val n = pats.values.sum
      val gs: ((Int, Int, Int)) => Seq[Int] = p => Seq(p._1, p._2, p._3)
      val newM = (0 until 3).map { i =>
        ws.collect { case (p, w) if gs(p)(i) == 1 => w * BigDecimal(pats(p)) }.sum.toDouble / sw.toDouble }
      val newU = (0 until 3).map { i =>
        ws.collect { case (p, w) if gs(p)(i) == 1 => (BigDecimal(1) - w) * BigDecimal(pats(p)) }.sum.toDouble / su.toDouble }
      lambda = sw.toDouble / n.toDouble
      m = newM.toArray; u = newU.toArray
    }
    assert(got.keySet === pats.keySet)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    pats.foreach { case (p, c) =>
      val (cnt, w, lam, mus) = got(p)
      assert(cnt === c, s"count for $p")
      assert(math.abs(w - post(p)) < 2e-6, s"posterior for $p: got $w want ${post(p)}")
      assert(math.abs(lam - lambda) < 2e-6, s"lambda: got $lam want $lambda")
      (0 until 3).foreach { i =>
        assert(math.abs(mus(2 * i) - m(i)) < 2e-6, s"m($i)")
        assert(math.abs(mus(2 * i + 1) - u(i)) < 2e-6, s"u($i)")
      }
    }
    // the planted semantics: duplicate patterns sit near w=1, the
    // name-coincidence pattern near w=0
    assert(got((1, 1, 1))._2 > 0.9 && got((0, 1, 1))._2 > 0.9)
    assert(got((1, 0, 0))._2 < 0.1)
  }

  test("resolveWithEmWeights: fitted-posterior threshold + closure = fastLink end to end") {
    // same planted corpus as the EM test: exact dups and typo dups must
    // cluster with their base record; cross-nat name coincidences must NOT
    val base = (1L to 30L).map(i => (i, s"alpha${i}beta$i", (i % 5).toInt, s"s${i % 3}"))
    val exact = base.filter(_._1 % 3 == 0).map { case (i, n, a, s) => (i + 100, n, a, s) }
    val typo = base.filter(_._1 % 4 == 0).map { case (i, n, a, s) => (i + 200, n + "z", a, s) }
    val coinc = base.filter(_._1 % 5 == 0).map { case (i, n, a, s) => (i + 300, n, (a + 1) % 5, "zz") }
    val recs = (base ++ exact ++ typo ++ coinc).toDF("id", "name", "nat", "seg")
    val got = EntityResolution.resolveWithEmWeights(
        recs, "id", "name", Seq("nat", "seg"), maxNameDist = 1,
        minPosterior = 0.9, iterations = 3, blockCol = Some("nat"))
      .select("id", "entity_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    base.foreach { case (i, _, _, _) =>
      if (i % 3 == 0) assert(got(i + 100) === got(i), s"exact dup of $i must merge")
      if (i % 4 == 0) assert(got(i + 200) === got(i), s"typo dup of $i must merge")
      if (i % 5 == 0) assert(got(i + 300) === (i + 300), s"coincidence $i must stay its own entity")
    }
    // unplanted records are singletons
    base.foreach { case (i, _, _, _) =>
      if (i % 3 != 0 && i % 4 != 0) assert(got(i) === i, s"record $i")
    }
  }

  test("resolveWithEmWeights: blocking that would drop fitted matches is rejected") {
    // exact duplicates that SPAN nations (the record moved between
    // extracts): pattern (name=1, nat=0, seg=1) is fitted as a match
    // class, so a nat block would drop true matches — the operator must
    // refuse instead of silently losing them
    val base = (1L to 30L).map(i => (i, s"alpha${i}beta$i", (i % 5).toInt, s"s${i % 3}"))
    val crossNatDup = base.filter(_._1 % 3 == 0).map { case (i, n, a, s) =>
      (i + 100, n, (a + 1) % 5, s) }
    val sameNatDup = base.filter(_._1 % 4 == 0).map { case (i, n, a, s) =>
      (i + 200, n, a, s) }
    val recs = (base ++ crossNatDup ++ sameNatDup).toDF("id", "name", "nat", "seg")
    val e = intercept[IllegalArgumentException] {
      EntityResolution.resolveWithEmWeights(
        recs, "id", "name", Seq("nat", "seg"), maxNameDist = 1,
        minPosterior = 0.9, iterations = 3, blockCol = Some("nat"))
    }
    assert(e.getMessage.contains("LOSSY"))
    // the same corpus and threshold resolve fine UNBLOCKED: the
    // cross-nation duplicates merge
    val got = EntityResolution.resolveWithEmWeights(
        recs, "id", "name", Seq("nat", "seg"), maxNameDist = 1,
        minPosterior = 0.9, iterations = 3, blockCol = None)
      .select("id", "entity_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    base.filter(_._1 % 3 == 0).foreach { case (i, _, _, _) =>
      assert(got(i + 100) === got(i), s"cross-nation dup of $i must merge")
    }
  }
}
