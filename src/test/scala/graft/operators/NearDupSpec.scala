package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.functions.{Hashing, TextAnalysis}

class NearDupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sf(), "documents")

  test("exactDedup keeps the min-id representative per content group") {
    val df = Seq((10, "same text"), (3, "same text"), (7, "other")).toDF("id", "text")
    val out = NearDup.exactDedup(df, "id", "text").orderBy("id").collect()
    assert(out.map(_.getInt(0)).toSeq === Seq(3, 7))
  }

  test("MinHash+LSH pairs equal exact inverted-index pairs on the corpus (J≥0.8)") {
    val exact = NearDup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = NearDup.minHashLshPairs(docs, "doc_id", "text", 3, 64, 16, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "testdata should contain planted near-duplicates")
    assert(lsh === exact)
  }

  test("SimHash block pairs equal brute-force hamming pairs (pigeonhole recall)") {
    val base = docs.select(
      col("doc_id"),
      Hashing.simHash(TextAnalysis.tokens(col("text"))).as("sim"))
    val a = base.toDF("id_a", "sim_a")
    val b = base.toDF("id_b", "sim_b")
    val brute = a.join(b, col("id_a") < col("id_b"))
      .filter(Hashing.hamming(col("sim_a"), col("sim_b")) <= 3)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val blocked = NearDup.simHashPairs(docs, "doc_id", "text", 3, 4)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked === brute)
    assert(brute.nonEmpty)
  }

  test("dropDuplicatesByPairs removes exactly the greater-id pair members") {
    val d = Seq((1, "x"), (2, "y"), (3, "z")).toDF("id", "text")
    val pairs = Seq((1, 3)).toDF("id_a", "id_b")
    val kept = NearDup.dropDuplicatesByPairs(d, "id", pairs)
      .collect().map(_.getInt(0)).toSet
    assert(kept === Set(1, 2))
  }

  test("repeatedSpanStats: cross-doc shingles mark spans, adjacent hits merge, unique docs report zero") {
    val d = Seq(
      // docs 1 and 2 share the 6-token run "a b c d e f": two overlapping
      // hot 5-shingles at positions 0,1 (doc 1) / 2,3 (doc 2) → ONE merged
      // span each, covering 6 tokens
      (1L, "a b c d e f g h"),
      (2L, "x y a b c d e f"),
      (3L, "totally unique words nothing shared here at all")
    ).toDF("doc_id", "text")
    val got = NearDup.repeatedSpanStats(d, "doc_id", "text", k = 5, minDf = 2L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))))
      .toMap
    assert(got(1L) === ((8, 2, 1, 6)), "doc 1: 8 tokens, 2 hot shingles, 1 span, 6 covered")
    assert(got(2L) === ((8, 2, 1, 6)), "doc 2 mirrors doc 1 at a different offset")
    assert(got(3L) === ((8, 0, 0, 0)), "unique doc: nothing repeated")
  }

  test("repeatedSpanStats: far-apart hot shingles stay separate spans; short docs clamp coverage") {
    val boiler = "q w e r t"
    val d = Seq(
      (1L, s"$boiler 1a 1b 1c 1d 1e 1f $boiler"),   // hot at pos 0 and 11, gap > k → 2 spans
      (2L, boiler),                                  // 5 tokens: whole-text shingle, one span
      (3L, s"$boiler other stuff"),
      (4L, "pad so df counts stay focused")
    ).toDF("doc_id", "text")
    val got = NearDup.repeatedSpanStats(d, "doc_id", "text", k = 5, minDf = 2L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))))
      .toMap
    assert(got(1L)._3 === 2, "two disjoint repeated regions")
    assert(got(1L)._4 === 10, "each span covers its 5 tokens")
    // doc 2 is exactly the boilerplate: its whole-text 5-shingle matches
    // doc 1/3's windows; coverage clamps to the 5 real tokens
    assert(got(2L) === ((5, 1, 1, 5)))
  }

  test("ngramJaccardPairs maxDocFreq cap drops hot-shingle work but keeps high-J pairs") {
    val capped = NearDup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8, maxDocFreq = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = NearDup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // planted dups share mostly doc-unique shingles, so the cap keeps them
    assert(capped === exact)
  }

  test("prefix-filtered Jaccard equals the full inverted index on the corpus") {
    val docs = graft.Tables.load(spark, sf(), "documents")
    val exact = NearDup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val prefix = NearDup.ngramJaccardPairsPrefix(docs, "doc_id", "text", 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(prefix === exact, "prefix filtering is provably complete — sets must match")
  }

  test("containmentPairs finds the embedded doc Jaccard misses") {
    import spark.implicits._
    // small is a verbatim prefix of big (every small-shingle ∈ big):
    // containment of the smaller side = 1.0, while Jaccard ≈ n_small/n_big
    // stays far under any useful threshold
    val small = "one two three four five six"
    val big = small + " " + (1 to 40).map(i => s"w$i").mkString(" ")
    val other = "totally different words entirely here now"
    val docs = Seq((1L, small), (2L, big), (3L, other)).toDF("doc_id", "text")
    val got = NearDup.containmentPairs(docs, "doc_id", "text", k = 3, threshold = 0.9)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(5))).toMap
    assert(got.keySet === Set((1L, 2L)))
    assert(got((1L, 2L)) === 1.0, "full embedding → containment exactly 1")
    val jacc = NearDup.ngramJaccardPairs(docs, "doc_id", "text", k = 3, threshold = 0.5)
      .collect()
    assert(jacc.isEmpty, "the same pair is invisible to Jaccard at 0.5 — the operator's point")
  }

  test("prefix filter survives exact integer-boundary sizes (t·n integral)") {
    import spark.implicits._
    // 5-shingle vs 4-shingle docs with intersection 4: J = 4/5 = 0.8
    // exactly, and t·na = 0.8·5 = 4 — the IEEE boundary the downward
    // nudge protects (both the length filter and the prefix length).
    val docs = Seq(
      (1L, "a b c d e f"),   // shingles: abc bcd cde def (4)… build via tokens
      (2L, "a b c d e f g")  // 5 shingles, intersection 4
    ).toDF("doc_id", "text")
    val got = NearDup.ngramJaccardPairsPrefix(docs, "doc_id", "text", 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === Seq((1L, 2L, 0.8)))
  }
}
