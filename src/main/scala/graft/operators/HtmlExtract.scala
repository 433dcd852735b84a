package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** HTML/markup boilerplate extraction — the stage every web-scale LLM
  * corpus runs BEFORE any text operator can see the document: raw pages
  * are tag soup dominated by navigation, chrome and templates, and
  * tokenization / quality scoring / dedup all assume clean text.
  *
  * Two-phase design (the jusText / trafilatura heuristic family,
  * Pomikálek 2011):
  *
  *   1. TEXTIFY — a fixed chain of deterministic transforms: scrub the
  *      three private markers, drop comments, drop `script`/`style`
  *      subtrees (content-free by construction), mark anchor text with
  *      marker chars (so link mass survives tag stripping), turn
  *      block-level tags into block delimiters, strip remaining tags,
  *      decode the common HTML entities (named core + their numeric
  *      twins; `&amp;` LAST so double-escapes like `&amp;lt;` decode one
  *      level, per the spec).
  *   2. CLASSIFY — per block: collapsed/trimmed text, char/word counts,
  *      LINK DENSITY = anchor-text chars / total chars. A block is
  *      CONTENT iff it is long enough (`minChars`) and link-sparse
  *      enough (`maxLinkDensity`) — short and link-heavy blocks are
  *      navigation/chrome with very high precision (the core jusText
  *      observation); everything is pure arithmetic over per-block
  *      counts, so a SQL oracle can replay the classification exactly.
  *
  * Every pattern is RE2-compatible (no lookaround, non-greedy + inline
  * flags only) so the identical regex chain runs in engines whose regex
  * is RE2 — the oracle-parity discipline of [[graft.functions]]
  * `normalizeText` (q_t10).
  *
  * Documented heuristic boundaries (tag soup is not a grammar):
  *   - a malformed unclosed tag (`<foo` with no `>`) stays literal text
  *     up to the next `>` if any — the behavior of every regex-level
  *     stripper, and deterministic;
  *   - block tags nested INSIDE an anchor split the anchor's markers
  *     across blocks; unbalanced markers never match the link-segment
  *     pattern, so such mass counts as plain text (undercounts link
  *     density, never over);
  *   - entity decode covers the core named set + numeric twins
  *     (`lt gt quot apos nbsp amp`, `#34 #39 #160`); exotic numeric
  *     references stay literal.
  *
  * Scale shape: the whole pipeline is scan-side — regexp chains and one
  * `posexplode`, no join, no shuffle until the consumer aggregates; the
  * only window is per-document block renumbering (partition width =
  * blocks in one document). At 100 TB this runs at parquet-scan speed.
  *
  * Reference scope note: the reference ingests clean relational rows
  * (banner-connector/ sql dir) and has no markup stage; this operator
  * is part of the beyond-reference LLM-pipeline surface.
  */
object HtmlExtract {

  /** Block-level elements whose open OR close tag ends a text block. */
  private val blockTags =
    "p|div|h[1-6]|li|ul|ol|dl|dt|dd|br|hr|table|thead|tbody|tfoot|tr|td|th|" +
      "section|article|header|footer|nav|aside|blockquote|pre|title|form|" +
      "figure|figcaption|main|body|html|head"

  private val BLK = "\u0001" // block delimiter
  private val LA = "\u0002"  // link-text open marker
  private val LZ = "\u0003"  // link-text close marker

  /** The fixed textify chain: html → entity-decoded text with U+0001
    * block delimiters and U+0002/U+0003 link-text markers.
    */
  def textify(html: Column): Column = {
    val noCtl = translate(coalesce(html, lit("")), BLK + LA + LZ, "")
    val noComment = regexp_replace(noCtl, "(?s)<!--.*?-->", " ")
    val noScript =
      regexp_replace(noComment, "(?is)<script\\b[^>]*>.*?</script>", " ")
    val noStyle =
      regexp_replace(noScript, "(?is)<style\\b[^>]*>.*?</style>", " ")
    val anchored =
      regexp_replace(noStyle, "(?is)<a\\b[^>]*>(.*?)</a>", LA + "$1" + LZ)
    val blocked = regexp_replace(
      anchored, s"(?i)</?(?:$blockTags)\\b[^>]*>", BLK)
    val noTags = regexp_replace(blocked, "(?s)<[^>]*>", " ")
    decodeEntities(noTags)
  }

  /** Core named entities + numeric twins; `&amp;` strictly last so one
    * escape level decodes per pass (HTML semantics for `&amp;lt;`).
    * Entity names are regex-literal, so plain regexp_replace chains are
    * exact and replayable.
    */
  def decodeEntities(c: Column): Column = {
    val steps = Seq(
      "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#34;" -> "\"",
      "&apos;" -> "'", "&#39;" -> "'",
      "&nbsp;" -> " ", "&#160;" -> " ",
      "&amp;" -> "&")
    steps.foldLeft(c) { case (acc, (pat, rep)) => regexp_replace(acc, pat, rep) }
  }

  /** Per-block scoreboard: one row per NON-EMPTY text block —
    * (doc_id, block_idx, block_text, n_chars, n_words, n_link_chars,
    * link_density, is_content). `block_idx` renumbers surviving blocks
    * densely per document in source order; counts are over the
    * whitespace-collapsed trimmed block text; `n_link_chars` sums the
    * collapsed-trimmed lengths of the block's balanced anchor segments.
    */
  /** Every split element (INCLUDING empty ones — a document whose html
    * produces no text still yields its rows here, which is what lets
    * [[extract]] stay total without a join back to the input):
    * (doc_id, __b, block_text, n_chars, n_link_chars).
    */
  private def blocksRaw(
      docs: DataFrame,
      idCol: String,
      htmlCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        posexplode(split(textify(col(htmlCol)), BLK)).as(Seq("__b", "__raw")))
      .withColumn("block_text",
        trim(regexp_replace(translate(col("__raw"), LA + LZ, ""), "\\s+", " ")))
      .withColumn("n_link_chars",
        aggregate(
          regexp_extract_all(col("__raw"),
            lit(LA + "([^" + LA + LZ + "]*)" + LZ), lit(1)),
          lit(0),
          (acc, x) =>
            acc + length(trim(regexp_replace(x, "\\s+", " ")))))
      .withColumn("n_chars", length(col("block_text")))
      .drop("__raw")

  def blocks(
      docs: DataFrame,
      idCol: String,
      htmlCol: String,
      minChars: Int = 25,
      maxLinkDensity: Double = 0.33): DataFrame = {
    require(minChars >= 1, "minChars must be positive")
    require(maxLinkDensity >= 0 && maxLinkDensity <= 1,
      "maxLinkDensity must be in [0, 1]")
    val w = Window.partitionBy("doc_id").orderBy("__b")
    blocksRaw(docs, idCol, htmlCol)
      .filter(length(col("block_text")) > 0)
      .select(
        col("doc_id"),
        (row_number().over(w) - 1).as("block_idx"),
        col("block_text"),
        col("n_chars"),
        size(split(col("block_text"), " ")).as("n_words"),
        col("n_link_chars"),
        round(col("n_link_chars").cast("double") / col("n_chars"), 6)
          .as("link_density"),
        (col("n_chars") >= minChars &&
          col("n_link_chars").cast("double") / col("n_chars")
            <= maxLinkDensity).as("is_content"))
  }

  /** The jusText core stoplist dimension: the most frequent English
    * function words (embedded, fixed — the classifier must be
    * deterministic and oracle-replayable; language packs are a caller
    * concern via the `stopwords` parameter).
    */
  val defaultStopwords: Seq[String] = Seq(
    "the", "of", "and", "a", "to", "in", "is", "it", "you", "that", "he",
    "was", "for", "on", "are", "as", "with", "his", "they", "i", "at",
    "be", "this", "have", "from", "or", "one", "had", "by", "but", "not",
    "what", "all", "were", "we", "when", "your", "can", "said", "there",
    "an", "which", "she", "do", "how", "their", "if", "will", "about",
    "so", "them", "would", "then", "its", "these", "has", "more", "her",
    "than", "him", "into", "no", "could", "our", "been", "who", "may",
    "any", "over", "also", "only", "most", "some", "such", "very")

  /** Full jusText-style block classification — link density AND
    * stopword density (Pomikálek 2011 §3: high stopword density is the
    * strongest single "this is prose" signal; chrome and code have
    * almost none): one row per non-empty block with
    * (doc_id, block_idx, block_text, n_chars, n_words, n_link_chars,
    * n_stop_words, stop_density, blk_class) where `blk_class` is
    * `short` (n_chars < minChars), `bad` (link-heavy OR stop-sparse)
    * or `good`. Token matching is EXACT on lowercased space-split
    * tokens — punctuation-attached tokens don't match (documented
    * boundary; the collapsed block text makes the split well-defined).
    * Pure scan-side like [[blocks]]: one extra array filter per block,
    * no new shuffle.
    */
  def blocksClassified(
      docs: DataFrame,
      idCol: String,
      htmlCol: String,
      minChars: Int = 25,
      maxLinkDensity: Double = 0.33,
      minStopDensity: Double = 0.30,
      stopwords: Seq[String] = defaultStopwords): DataFrame = {
    require(minStopDensity >= 0 && minStopDensity <= 1,
      "minStopDensity must be in [0, 1]")
    require(stopwords.nonEmpty, "stopwords must not be empty")
    val nStop = size(filter(split(col("block_text"), " "),
      x => lower(x).isInCollection(stopwords)))
    blocks(docs, idCol, htmlCol, minChars, maxLinkDensity)
      .withColumn("n_stop_words", nStop)
      .withColumn("stop_density",
        round(col("n_stop_words").cast("double") / col("n_words"), 6))
      .withColumn("blk_class",
        when(col("n_chars") < minChars, "short")
          .when(!col("is_content"), "bad") // link-heavy
          .when(col("n_stop_words").cast("double") / col("n_words") <
            minStopDensity, "bad")
          .otherwise("good"))
      .drop("link_density", "is_content")
  }

  /** The cleaned document: content blocks joined with `\n` in source
    * order — (doc_id, text, n_blocks_kept, n_blocks_dropped). TOTAL:
    * one row per input document, including documents that produce no
    * text block at all (empty text, zero counts) — aggregated over the
    * unfiltered split elements, so totality costs no join back to the
    * input (the r15 ADVICE q_f15 engine/oracle-divergence fix).
    */
  def extract(
      docs: DataFrame,
      idCol: String,
      htmlCol: String,
      minChars: Int = 25,
      maxLinkDensity: Double = 0.33): DataFrame = {
    require(minChars >= 1, "minChars must be positive")
    require(maxLinkDensity >= 0 && maxLinkDensity <= 1,
      "maxLinkDensity must be in [0, 1]")
    val nonEmpty = length(col("block_text")) > 0
    // greatest(…, 1): empty rows reach this aggregate now, and ANSI
    // faults a 0 divisor even under a false guard (subexpression
    // elimination hoists the division); n_chars >= minChars >= 1 makes
    // the clamp a no-op on every row the predicate can accept
    val isContent = col("n_chars") >= minChars &&
      col("n_link_chars").cast("double") / greatest(col("n_chars"), lit(1)) <=
        maxLinkDensity
    blocksRaw(docs, idCol, htmlCol)
      .groupBy(col("doc_id"))
      .agg(
        concat_ws("\n",
          transform(
            array_sort(collect_list(
              when(nonEmpty && isContent,
                struct(col("__b"), col("block_text"))))),
            s => s.getField("block_text"))).as("text"),
        sum(when(nonEmpty && isContent, 1L).otherwise(0L))
          .as("n_blocks_kept"),
        sum(when(nonEmpty && !isContent, 1L).otherwise(0L))
          .as("n_blocks_dropped"))
  }
}
