package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FuzzyJoinSpec extends SparkSpec {

  private def exhaustive(names: Seq[String], maxDist: Int): Set[(String, String, Int)] = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(
          math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    (for {
      a <- names; b <- names
      if a < b
      d = lev(a, b)
      if d <= maxDist
    } yield (a, b, d)).toSet
  }

  test("blocked fuzzy join equals the exhaustive pair set (incl. no-shared-token pairs)") {
    import spark.implicits._
    // "red bolt" vs "rad belt" is distance 2 with NO shared token — the
    // case token-blocking would lose and the q-gram count filter must keep
    val names = Seq(
      "red bolt", "rad belt", "red boat", "blue bolt", "blue belt",
      "small ring", "small king", "smell ring", "large ring",
      "hot gear", "hot bear", "hot year", "cold gear",
      "widget", "gadget", "midget", "unrelated thing")
    val df = names.toDF("name")
    val got = FuzzyJoin.fuzzySelfPairs(df, "name", maxDist = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)))
      .toSet
    assert(got === exhaustive(names, 2))
  }

  test("stop-gram capping stays sound (subset of exact, exact distances)") {
    import spark.implicits._
    val names = Seq("aaa bbb", "aaa bbc", "aaa bbd", "zzz yyy", "zzz yyx")
    val capped = FuzzyJoin.fuzzySelfPairs(names.toDF("name"), "name", maxDist = 2,
        maxGramDf = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)))
      .toSet
    val exact = exhaustive(names, 2)
    assert(capped.subsetOf(exact), "capping may drop pairs, never invent them")
  }

  test("short strings sharing zero grams are still found (exhaustive short block)") {
    import spark.implicits._
    // q=2, d=1: "ab" vs "cb" is distance 1 with ZERO shared bigrams —
    // the count-filter threshold is non-positive so the gram equi-join
    // alone can never witness the pair (ADVICE r7). The short block must.
    val names = Seq("ab", "cb", "ax", "abcd", "abce", "xy")
    val got = FuzzyJoin.fuzzySelfPairs(names.toDF("name"), "name", maxDist = 1)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)))
      .toSet
    val exact = exhaustive(names, 1)
    assert(got === exact)
    assert(exact.contains(("ab", "cb", 1)), "sanity: the evading pair is in the oracle")
  }

  test("segment blocking equals the exhaustive pair set (indels shift segments)") {
    import spark.implicits._
    // deletions/insertions shift every later segment — the ±d probe
    // window must still find the surviving segment; fixed-position
    // segment equality alone would lose "abcdefgh" vs "bcdefgh"
    val names = Seq(
      "abcdefgh", "bcdefgh", "abcdefghx", "xbcdefgh", "abxdefgh",
      "red bolt", "rad belt", "red boat", "blue bolt",
      "aa11bb22", "aa11bb2z", "a11bb22", "aa1bb22z",
      "widget", "gadget", "midget", "unrelated thing")
    val got = FuzzyJoin.segmentSelfPairs(names.toDF("name"), "name", maxDist = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)))
      .toSet
    assert(got === exhaustive(names, 2))
  }

  test("segment blocking: short strings (length <= d) and short-vs-long pairs") {
    import spark.implicits._
    // both-short pairs go through the exhaustive block; a short string
    // against a longer one must come out of the main path
    val names = Seq("a", "b", "ab", "abc", "abcd", "xyz")
    val got = FuzzyJoin.segmentSelfPairs(names.toDF("name"), "name", maxDist = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)))
      .toSet
    assert(got === exhaustive(names, 2))
  }

  test("segment blocking agrees with gram blocking on a randomized hex corpus") {
    import spark.implicits._
    // the motivating low-entropy case: md5-prefix names; both complete
    // blockings must produce the identical verified pair set
    val rnd = new scala.util.Random(7)
    val base = (1 to 120).map(_ => rnd.alphanumeric.filter(c => "0123456789abcdef".contains(c)).take(8).mkString)
    val mutated = base.take(30).map(s => s.dropRight(1) + "z") ++
      base.slice(30, 50).map(s => s.tail)
    val names = (base ++ mutated).distinct
    val seg = FuzzyJoin.segmentSelfPairs(names.toDF("name"), "name", maxDist = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val gram = FuzzyJoin.fuzzySelfPairs(names.toDF("name"), "name", maxDist = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(seg === gram)
    assert(seg === exhaustive(names, 2))
  }

  test("duplicate and null rows collapse; short strings are skipped") {
    import spark.implicits._
    val df = Seq("abcd", "abcd", "abce", null, "a").toDF("name")
    val got = FuzzyJoin.fuzzySelfPairs(df, "name", maxDist = 1)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    assert(got.toSeq === Seq(("abcd", "abce", 1)))
  }
}
