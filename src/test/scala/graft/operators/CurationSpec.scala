package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val keys = (1L to 2000L).toDF("id")

  test("hashUnit is uniform-ish, deterministic, and seed-sensitive") {
    val h = keys.select(Curation.hashUnit(col("id"), "s1").as("h"))
    val Array(lo, hi, cnt) =
      h.agg(min("h"), max("h"), count(lit(1))).collect().head.toSeq.toArray
    assert(lo.asInstanceOf[Double] >= 0.0 && hi.asInstanceOf[Double] < 1.0)
    assert(cnt === 2000L)
    // deterministic across evaluations
    val a = h.collect().map(_.getDouble(0)).toSeq
    val b = keys.select(Curation.hashUnit(col("id"), "s1")).collect().map(_.getDouble(0)).toSeq
    assert(a === b)
    // a different seed reshuffles the values
    val c = keys.select(Curation.hashUnit(col("id"), "s2")).collect().map(_.getDouble(0)).toSeq
    assert(a !== c)
  }

  test("deterministicSample hits the rate and nests across rates (same seed)") {
    val n25 = Curation.deterministicSample(keys, "id", 0.25, "s").count()
    assert(math.abs(n25 - 500.0) < 80, s"expected ~500 of 2000 at rate .25, got $n25")
    assert(Curation.deterministicSample(keys, "id", 0.0, "s").count() === 0)
    assert(Curation.deterministicSample(keys, "id", 1.0, "s").count() === 2000)
    // threshold construction ⇒ smaller samples are subsets of larger ones
    val small = Curation.deterministicSample(keys, "id", 0.1, "s")
      .collect().map(_.getLong(0)).toSet
    val large = Curation.deterministicSample(keys, "id", 0.3, "s")
      .collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(large))
  }

  test("stratifiedSample applies per-stratum rates with a default") {
    val df = (1L to 3000L).map(i => (i, if (i <= 1000) "a" else if (i <= 2000) "b" else "c"))
      .toDF("id", "grp")
    val out = Curation.stratifiedSample(
      df, "id", "grp", Map("a" -> 1.0, "b" -> 0.2), defaultRate = 0.0, seed = "s")
    val byGrp = out.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byGrp("a") === 1000L)
    assert(math.abs(byGrp("b") - 200.0) < 60, s"rate .2 of 1000 → ~200, got ${byGrp("b")}")
    assert(!byGrp.contains("c"))
  }

  test("mixture downsamples to target proportions without upsampling") {
    // 2400 'web', 300 'books': targets 50/50 ⇒ scale bound by books (300/.5=600)
    val df = ((1L to 2400L).map((_, "web")) ++ (5001L to 5300L).map((_, "books")))
      .toDF("id", "src")
    val out = Curation.mixture(df, "id", "src", Map("web" -> 0.5, "books" -> 0.5), "s")
    val bySrc = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // books: rate 1.0 → all 300 kept; web: rate 300/2400 → ~300
    assert(bySrc("books") === 300L)
    assert(math.abs(bySrc("web") - 300.0) < 70, s"expected ~300 web rows, got ${bySrc("web")}")
    // a stratum with no weight disappears
    val out2 = Curation.mixture(df, "id", "src", Map("web" -> 1.0), "s")
    assert(out2.filter(col("src") === "books").count() === 0)
  }

  test("packSequences: known answers, straddling docs, bucket-width invariance") {
    // tokens: 5,4,3,2 with budget 6 → exclusive cumsums 0,5,9,12
    val df = Seq((1L, 5L), (2L, 4L), (3L, 3L), (4L, 2L)).toDF("id", "tc")
    val got = Curation.packSequences(df, "id", "tc", budget = 6, bucketWidth = 2)
      .select("id", "pack_id", "pack_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // doc2 starts at offset 5 inside pack 0 and straddles into pack 1
    assert(got === Set((1L, 0L, 0L), (2L, 0L, 5L), (3L, 1L, 3L), (4L, 2L, 0L)))

    // equality with the naive global-window cumsum, and bucketWidth must not matter
    val rnd = new scala.util.Random(11)
    val big = (1L to 500L).map(i => (i, (rnd.nextInt(50) + 1).toLong)).toDF("id", "tc")
    val naive = big
      .withColumn("__cum",
        coalesce(sum("tc").over(
          Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("id"), floor(col("__cum") / 128).as("pack_id"),
        (col("__cum") % 128).as("pack_offset"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    Seq(7, 64, 100000).foreach { bw =>
      val two = Curation.packSequences(big, "id", "tc", budget = 128, bucketWidth = bw)
        .select("id", "pack_id", "pack_offset")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(two === naive, s"bucketWidth=$bw diverged from the naive cumsum")
    }
  }

  test("sampleExactK picks exactly the k hash-smallest keys, no global sort needed") {
    val got = Curation.sampleExactK(keys, "id", 50, "s")
      .collect().map(_.getLong(0)).toSet
    val naive = keys
      .orderBy(Curation.hashUnit(col("id"), "s"), col("id"))
      .limit(50)
      .collect().map(_.getLong(0)).toSet
    assert(got === naive)
    assert(got.size === 50)
    // deterministic across evaluations
    val again = Curation.sampleExactK(keys, "id", 50, "s")
      .collect().map(_.getLong(0)).toSet
    assert(again === got)
  }

  test("weightedSampleK: deterministic, exactly k, and weight-monotone inclusion") {
    val df = keys.withColumn("w", when(col("id") <= 1000, 1.0).otherwise(100.0))
    val a = Curation.weightedSampleK(df, "id", "w", 200, "ws").collect().map(_.getLong(0)).toSet
    val b = Curation.weightedSampleK(df, "id", "w", 200, "ws").collect().map(_.getLong(0)).toSet
    assert(a === b)
    assert(a.size === 200)
    // heavy rows (w=100) should dominate the sample: P(pick|w=1) is tiny
    val heavy = a.count(_ > 1000)
    assert(heavy > 150, s"expected heavy-weight rows to dominate, got $heavy/200")
    // null/non-positive weights are never sampled
    val withBad = df.withColumn("w", when(col("id") === 5, -1.0).otherwise(col("w")))
    val c = Curation.weightedSampleK(withBad, "id", "w", 2000, "ws").collect().map(_.getLong(0)).toSet
    assert(!c.contains(5L) && c.size === 1999)
  }

  test("assignSplit: deterministic, complete, and proportional-ish") {
    val out = Curation.assignSplit(keys, "id", Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125), "sp")
    val counts = out.groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet === Set("train", "val", "test"))
    assert(counts.values.sum === 2000L)
    assert(counts("train") > 1300 && counts("train") < 1700)
    // same seed, same assignment; different seed reshuffles
    val again = Curation.assignSplit(keys, "id", Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125), "sp")
    assert(out.except(again).isEmpty)
    val other = Curation.assignSplit(keys, "id", Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125), "sp2")
    assert(out.except(other).count() > 0)
  }

  test("topKPerGroup equals the window reference") {
    val rnd = new scala.util.Random(3)
    val df = (1L to 400L).map(i => (i, s"g${i % 7}", rnd.nextDouble() * 100))
      .toDF("id", "grp", "score")
    val heap = Curation.topKPerGroup(df, "grp", "score", "id", 5)
      .select("grp", "id", "rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val win = df
      .withColumn("rank", row_number().over(
        Window.partitionBy("grp").orderBy(col("score").desc, col("id"))))
      .filter(col("rank") <= 5)
      .select("grp", "id", "rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(heap === win)
  }

  test("leakageSafeSplit: near-dup cluster members always share a split; doc-id keying would not") {
    import graft.{Tables => T}
    val docs = T.load(spark, sf(), "documents")
    val pairs = NearDup.minHashLshPairs(docs, "doc_id", "text",
      k = 3, numPerm = 64, bands = 16, threshold = 0.8)
    val splits = Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125)
    val safe = Curation.leakageSafeSplit(docs, "doc_id", pairs, splits, "lsplit")
      .select("doc_id", "split")
    val byId = safe.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairList = pairs.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairList.nonEmpty, "corpus plants near-dups")
    pairList.foreach { case (a, b) =>
      assert(byId(a) === byId(b), s"near-dups $a/$b must share a split")
    }
    // the bug this prevents: the plain doc-id-keyed split DOES separate
    // at least one near-dup pair on this corpus (deterministic hash)
    val naive = Curation.assignSplit(docs, "doc_id", splits, "lsplit")
      .select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pairList.exists { case (a, b) => naive(a) != naive(b) },
      "doc-id keying should split some near-dup pair (else the test proves nothing)")
  }

  test("temperatureMixture: exact sqrt-scaled quotas, small strata up-weighted, deterministic") {
    // strata of 400 / 100 / 4 rows; α = 0.5 weights 20 : 10 : 2
    val rows = (1L to 400L).map((_, "big")) ++
      (401L to 500L).map((_, "mid")) ++ (501L to 504L).map((_, "tiny"))
    val df = rows.toDF("id", "src")
    val total = 64L
    val got = Curation.temperatureMixture(df, "src", "id", total, seed = "tm")
    val bySrc = got.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val z = math.sqrt(400) + math.sqrt(100) + math.sqrt(4) // 32, exactly
    val expect = Map(
      "big" -> math.floor(total * math.sqrt(400) / z).toLong, //  40
      "mid" -> math.floor(total * math.sqrt(100) / z).toLong, //  20
      "tiny" -> math.min(4, math.floor(total * math.sqrt(4) / z).toLong)) // 4
    assert(bySrc === expect)
    // sampling share of tiny (100%) far exceeds its population share (0.8%)
    // while big is cut to 10% — the α < 1 up-weighting contract
    assert(bySrc("tiny") === 4L && bySrc("big") === 40L)
    val again = Curation.temperatureMixture(df, "src", "id", total, seed = "tm")
      .collect().map(_.getLong(0)).sorted
    assert(again === got.collect().map(_.getLong(0)).sorted, "replay keeps the same rows")
  }
}
