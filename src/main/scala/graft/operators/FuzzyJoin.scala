package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance fuzzy self-join with a provably complete q-gram
  * count-filter block, the standard scalable shape for entity resolution
  * (matching the reference's student/staff identity-matching use case on
  * free-text names, SisConnectorService.java:142-160 keyed syncs):
  *
  *  1. scan-side q-gram set per string (`transform(sequence(...))` — all
  *     codegen HOFs, no UDF);
  *  2. candidate pairs via a gram equi-join + count filter: one edit
  *     operation rewrites at most q of a string's q-gram windows, so
  *     `ED(a,b) <= d` implies `|G(a) ∩ G(b)| >= max(|G(a)|,|G(b)|) − d·q`
  *     (sets: destroying ≤ d·q gram instances removes ≤ d·q distinct
  *     grams). The filter is sound — it can only over-select — so the
  *     exact verify step loses nothing;
  *  3. exact `levenshtein(a, b, d)` (the thresholded form: early-exits
  *     the DP once the band exceeds d) only on survivors.
  *
  * At 100 TB the gram join is the shuffle and obeys the same discipline
  * as the n-gram near-dup path (NearDup.scala): stop-gram capping by
  * document frequency bounds the hottest gram's bucket — wired here via
  * `maxGramDf` with the SAME completeness trade as q_d2b (a capped gram
  * can no longer witness a candidate pair on its own; pairs sharing only
  * capped grams are missed — cap well above the d·q slack in practice).
  *
  * Completeness: the count filter only forces a shared gram when
  * max(|G(a)|,|G(b)|) − d·q >= 1, so pairs of SHORT strings (both with
  * <= d·q grams) could be within distance d while sharing zero grams —
  * those are routed through a separate exhaustive block over the
  * (alphabet-bounded, tiny) short-string set, making the blocking
  * provably complete for every string of length >= q. Precondition:
  * strings shorter than q yield no grams at all and are excluded; route
  * them through an exact or length-1 block instead.
  */
object FuzzyJoin {

  /** Distinct q-gram set of column `col` (codegen HOFs, no UDF). The SQL
    * `substr` form is used because the Column-DSL `substring` only takes
    * literal Int offsets, not the lambda variable.
    */
  private[operators] def gramsExpr(col: String, q: Int): Column =
    array_distinct(expr(
      s"transform(sequence(1, greatest(length($col) - ${q - 1}, 0)), i -> substr($col, i, $q))"))

  /** All unordered pairs (a < b) of `df`'s DISTINCT `nameCol` values with
    * edit distance ≤ `maxDist`. Output: name_a, name_b, dist.
    *
    * `maxGramDf` = 0 disables stop-gram capping (exact completeness, the
    * oracle-gate configuration); at scale set it to bound the hottest
    * gram's candidate bucket.
    */
  def fuzzySelfPairs(
      df: DataFrame,
      nameCol: String,
      maxDist: Int,
      q: Int = 2,
      maxGramDf: Long = 0L): DataFrame =
    fuzzySelfPairsBlocked(
      df.select(col(nameCol), lit(0).as("__all")), nameCol, "__all",
      maxDist, q, maxGramDf)
      .drop("__all")

  /** [[fuzzySelfPairs]] with an EQUI-BLOCKING key: only pairs sharing
    * `blockCol` are candidates — the standard entity-resolution move
    * when a hard predicate (same district, same nation, same birth
    * year) is known to hold for every true match. The gram join and the
    * short-string block both carry the key, so candidate volume scales
    * with Σ|block|-local work instead of the corpus-wide gram buckets
    * (sequentially-numbered record names, which share long prefixes
    * corpus-wide, are the motivating blowup: the count filter alone
    * cannot prune them, q_f7 at sf0.1). Completeness holds WITHIN each
    * block; cross-block pairs are deliberately out of scope — callers
    * must ensure they cannot be matches (EntityResolution asserts this
    * from the score weights).
    *
    * Output: (blockCol, name_a, name_b, dist).
    */
  def fuzzySelfPairsBlocked(
      df: DataFrame,
      nameCol: String,
      blockCol: String,
      maxDist: Int,
      q: Int = 2,
      maxGramDf: Long = 0L): DataFrame = {
    val names = df
      .select(col(blockCol).as("__blk"), col(nameCol).as("name"))
      .where(col("name").isNotNull && length(col("name")) >= q && col("__blk").isNotNull)
      .distinct()
      .select(col("__blk"), col("name"), gramsExpr("name", q).as("grams"))
      .select(col("__blk"), col("name"), col("grams"), size(col("grams")).as("ng"))

    val exploded =
      names.select(col("__blk"), col("name"), col("ng"), explode(col("grams")).as("gram"))
    val surviving =
      if (maxGramDf <= 0) exploded
      else {
        // df counted per (block, gram): a gram hot in one block may be
        // rare in another
        val df_ = exploded.groupBy("__blk", "gram").agg(count(lit(1)).as("gram_df"))
        exploded.join(
          broadcast(df_.where(col("gram_df") <= maxGramDf).select("__blk", "gram")),
          Seq("__blk", "gram"))
      }

    val a = surviving.select(
      col("__blk"), col("gram"), col("name").as("name_a"), col("ng").as("ng_a"))
    val b = surviving.select(
      col("__blk"), col("gram"), col("name").as("name_b"), col("ng").as("ng_b"))
    // The count-filter lemma only FORCES a shared gram when
    // max(ng_a, ng_b) − d·q >= 1. Pairs where BOTH sides have
    // ng <= d·q can be within distance d yet share zero grams
    // (q=2, d=1: "ab" vs "cb") and would silently evade the gram
    // equi-join — route those through the exhaustive short block
    // below and exclude them here so the union stays disjoint.
    val shortCut = maxDist.toLong * q
    val candidates = a
      .join(b, Seq("__blk", "gram"))
      .where(col("name_a") < col("name_b"))
      .where(col("ng_a") > shortCut || col("ng_b") > shortCut)
      .groupBy("__blk", "name_a", "name_b", "ng_a", "ng_b")
      .agg(count(lit(1)).as("shared"))
      .where(col("shared") >= greatest(col("ng_a"), col("ng_b")) - lit(maxDist * q))
      .where(abs(length(col("name_a")) - length(col("name_b"))) <= maxDist)
      .select(col("__blk"), col("name_a"), col("name_b"))

    // Exhaustive block over the short strings (ng <= d·q, i.e. length
    // <= d·q + q − 1): the set of distinct strings that short is
    // alphabet-bounded and tiny in practice, so an O(|S|²) broadcast
    // nested-loop with the length filter is the scale-correct shape —
    // NOT a corpus-sized cross join.
    val shorts = names.where(col("ng") <= shortCut).select(col("__blk"), col("name"))
    val shortPairs = shorts.toDF("__blk", "name_a")
      .join(
        broadcast(shorts.toDF("__blk_b", "name_b")),
        col("__blk") === col("__blk_b") &&
          col("name_a") < col("name_b") &&
          abs(length(col("name_a")) - length(col("name_b"))) <= maxDist)
      .drop("__blk_b")

    candidates.unionByName(shortPairs)
      .select(
        col("__blk").as(blockCol), col("name_a"), col("name_b"),
        levenshtein(col("name_a"), col("name_b"), maxDist).as("dist"))
      .where(col("dist") >= 0 && col("dist") <= maxDist)
  }

  /** [[segmentSelfPairsBlocked]] without a blocking key. */
  def segmentSelfPairs(
      df: DataFrame,
      nameCol: String,
      maxDist: Int): DataFrame =
    segmentSelfPairsBlocked(
      df.select(col(nameCol), lit(0).as("__all")), nameCol, "__all", maxDist)
      .drop("__all")

  /** PassJoin-style SEGMENT blocking (Li, Deng & Feng 2011) — the
    * candidate generator to prefer over the q-gram count filter when the
    * name alphabet is small relative to q-gram capacity (hex ids, digit
    * runs, short codes): there the gram equi-join degenerates toward a
    * within-block cross join (a 16-char alphabet has only 256 bigrams,
    * so ~1/3 of RANDOM 10-char hex name pairs share one — measured as a
    * 37x wall-clock blowup on 10x data for q_f7 at sf1.0, pure
    * candidate-volume growth), while segment keys are exact substring
    * matches whose collision probability falls exponentially with
    * segment length.
    *
    * Scheme, for threshold d with k = d+1 segments:
    *  - INDEX side: every string s of length >= k partitions into k
    *    even segments (first k − l%k of length ⌊l/k⌋, rest one longer);
    *    key = (l, j, segment value).
    *  - PROBE side: every string r emits, for each partner length
    *    ll ∈ [|r|−d, |r|+d] with ll >= k and each segment j, the
    *    substrings of r with the scheme's length at starts within ±d of
    *    the scheme's position — a LITERAL (2d+1)·k·(2d+1) combo set
    *    (75 for d=2), generated scan-side and validity-filtered.
    *  - candidates = index ⋈ probe on (length, segment, value), then
    *    exact thresholded `levenshtein` on the deduped pairs.
    *
    * Completeness: ≤ d edits touch ≤ d of the k = d+1 segments
    * (pigeonhole), so some segment of s survives VERBATIM in r, and its
    * start can shift by at most the prefix's net indel balance, i.e.
    * ±d — exactly the probe window. Pairs where BOTH sides are shorter
    * than k (length <= d) route through the exhaustive short block (an
    * alphabet-bounded tiny set); a short-vs-long pair is covered by the
    * main path because a long string's surviving segment must fit
    * inside the short partner for the pair to be within distance d.
    *
    * Scale shape: one distinct over (block, name), k index keys and
    * ≤ 75 probe keys per distinct name (constant fan-out, scan-side
    * `substr`/HOF arithmetic, no UDF), one equi-join keyed on
    * (block, partner length, segment index, segment value) — candidate
    * volume is driven by exact substring collisions, not gram-alphabet
    * density — then the thresholded-DP verify on survivors only.
    *
    * Output: (blockCol, name_a, name_b, dist), the
    * [[fuzzySelfPairsBlocked]] contract.
    */
  def segmentSelfPairsBlocked(
      df: DataFrame,
      nameCol: String,
      blockCol: String,
      maxDist: Int): DataFrame = {
    require(maxDist >= 1, "maxDist must be >= 1")
    val d = maxDist
    val k = d + 1
    val names = df
      .select(col(blockCol).as("__blk"), col(nameCol).as("name"))
      .where(col("name").isNotNull && length(col("name")) >= 1 && col("__blk").isNotNull)
      .distinct()
      .withColumn("l", length(col("name")))

    // even-partition scheme of a length-ll string: segment j has length
    // base + (j >= k − ll%k) and 1-based start 1 + j·base + max(0, j − (k − ll%k)).
    // The (partner length, segment, shift) fan-out is built as STAGED
    // explodes over tiny literal arrays with the scheme arithmetic in
    // shared intermediate columns — one flat 75-struct projection
    // re-derives the whole expression tree per struct and ran ~6x
    // slower (measured 20 s vs 3.5 s on the q_f7 name frame).
    def withScheme(df: DataFrame, ll: Column): DataFrame = df
      .withColumn("__base", ((ll - pmod(ll, lit(k))) / k).cast("int"))
      .withColumn("__rem", pmod(ll, lit(k)).cast("int"))
      .withColumn(
        "len",
        col("__base") + when(col("j") >= lit(k) - col("__rem"), 1).otherwise(0))
      .withColumn(
        "__p",
        lit(1) + col("j") * col("__base") +
          greatest(lit(0), col("j") - (lit(k) - col("__rem"))))

    val jArr = array((0 until k).map(lit): _*)
    val longs = names.where(col("l") >= k)
    val idx = withScheme(
      longs.select(
        col("__blk"), col("name").as("name_s"), col("l").as("ls"),
        explode(jArr).as("j")),
      col("ls"))
      .select(
        col("__blk"), col("name_s"), col("ls"), col("j"),
        col("name_s").substr(col("__p"), col("len")).as("seg"))

    val shiftArr = array((-d to d).map(lit): _*)
    val probes = withScheme(
      names.select(
        col("__blk"), col("name").as("name_r"), col("l").as("lr"),
        explode(shiftArr).as("dl"))
        .withColumn("ls", col("lr") + col("dl"))
        .where(col("ls") >= k)
        .select(col("__blk"), col("name_r"), col("lr"), col("ls"), explode(jArr).as("j")),
      col("ls"))
      .select(
        col("__blk"), col("name_r"), col("lr"), col("ls"), col("j"), col("len"),
        col("__p"), explode(shiftArr).as("shift"))
      .withColumn("start", col("__p") + col("shift"))
      .where(col("start") >= 1 && col("start") + col("len") - 1 <= col("lr"))
      .select(
        col("__blk"), col("name_r"), col("ls"), col("j"),
        col("name_r").substr(col("start"), col("len")).as("seg"))

    val candidates = idx
      .join(probes, Seq("__blk", "ls", "j", "seg"))
      .where(col("name_s") =!= col("name_r"))
      .select(
        col("__blk"),
        least(col("name_s"), col("name_r")).as("name_a"),
        greatest(col("name_s"), col("name_r")).as("name_b"))
      .distinct()

    // both sides shorter than k (length <= d): alphabet-bounded tiny set
    val shorts = names.where(col("l") < k).select(col("__blk"), col("name"))
    val shortPairs = shorts.toDF("__blk", "name_a")
      .join(
        broadcast(shorts.toDF("__blk_b", "name_b")),
        col("__blk") === col("__blk_b") &&
          col("name_a") < col("name_b") &&
          abs(length(col("name_a")) - length(col("name_b"))) <= d)
      .drop("__blk_b")

    candidates.unionByName(shortPairs)
      .select(
        col("__blk").as(blockCol), col("name_a"), col("name_b"),
        levenshtein(col("name_a"), col("name_b"), d).as("dist"))
      .where(col("dist") >= 0 && col("dist") <= d)
  }
}
