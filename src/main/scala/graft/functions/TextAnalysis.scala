package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis scalar operators for large-scale training-data pipelines:
  * tokenization, language ID, quality scoring, document fingerprinting.
  *
  * Everything is column-in/column-out over Spark built-ins and higher-order
  * functions — no UDFs, no driver round-trips — so the operators inline into
  * whole-stage-codegen'd projections and scale linearly with input splits
  * (a 100 TB corpus is just more partitions; there is no per-operator
  * shuffle here at all).
  */
object TextAnalysis {

  /** Jaro–Winkler name similarity (native codegen kernel,
    * [[graft.expressions.JaroWinkler]]) — semantics pinned to DuckDB's
    * `jaro_winkler_similarity`: empty → 0, integer match window,
    * 0.1-weight prefix boost (cap 4) only above jaro 0.7.
    */
  def jaroWinkler(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.expressions.JaroWinkler(
        org.apache.spark.sql.graft.bridge.expression(a),
        org.apache.spark.sql.graft.bridge.expression(b)))

  /** Whitespace tokens of trimmed, lowercased text; empty text → []. */
  def tokens(text: Column): Column = {
    val t = lower(trim(text))
    when(t === "", array().cast("array<string>")).otherwise(split(t, "\\s+"))
  }

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish sub-word pre-tokenization (GPT-2-style contractions + word /
    * number / punctuation runs), for token-budget estimation.
    */
  def bpeIshTokens(text: Column): Column =
    regexp_extract_all(
      text,
      lit("'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]+|[^\\sA-Za-z0-9]+"),
      lit(0))

  def bpeIshTokenCount(text: Column): Column = size(bpeIshTokens(text))

  /** Sentence-count heuristic: runs of sentence terminators `[.!?]+`,
    * floored at 1 so per-sentence ratios stay defined on terminator-free
    * text (a headline is one sentence, not zero).
    */
  def sentenceCount(text: Column): Column =
    greatest(lit(1), size(regexp_extract_all(text, lit("[.!?]+"), lit(0))))

  /** Syllable total under the classic vowel-group heuristic: per token,
    * the number of `[aeiouy]+` runs floored at 1 (an all-consonant or
    * numeric token still costs one syllable to say). One `aggregate`
    * HOF over the q_t1 tokenization — scan-side, no UDF.
    */
  def syllableCount(text: Column): Column =
    aggregate(
      tokens(text), lit(0),
      (acc, t) => acc + greatest(lit(1), size(regexp_extract_all(t, lit("[aeiouy]+"), lit(0)))))

  /** Flesch reading ease: `206.835 − 1.015·(words/sentences) −
    * 84.6·(syllables/words)` over the q_t1 token contract and the
    * heuristics above — the classic prose-difficulty score (higher =
    * easier), a standard quality-filter feature next to [[qualityScore]].
    * Empty text (zero tokens) → NULL: the score is undefined, and 0
    * would be a (very hard) valid value. The arithmetic is a fixed
    * left-to-right IEEE expression, so any engine reproduces it
    * bit-exactly.
    */
  def fleschReadingEase(text: Column): Column = {
    val nW = tokenCount(text)
    when(
      nW === 0, lit(null).cast("double")).otherwise(
      lit(206.835)
        - lit(1.015) * (nW.cast("double") / sentenceCount(text).cast("double"))
        - lit(84.6) * (syllableCount(text).cast("double") / nW.cast("double")))
  }

  // --- language identification (stopword-hit heuristic + CJK script) -----

  private val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "of", "and", "to", "in", "is", "you", "that", "it",
      "was", "for", "on", "are", "as", "with", "they", "at", "this", "have"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ich", "nicht", "sie",
      "mit", "sich", "auf", "für", "als", "auch", "es", "ein", "eine", "zu"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "un", "une", "du",
      "que", "pas", "pour", "dans", "ce", "il", "qui", "ne", "sur", "se"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "se", "no", "por",
      "con", "su", "para", "como", "es", "los", "las", "una", "más"))

  /** Count of tokens that are stopwords of `lang` (frequency-weighted). */
  def stopwordHits(toks: Column, lang: String): Column =
    size(filter(toks, t => array_contains(lit(stopwords(lang).toArray), t)))

  /** Heuristic language ID over a small closed set ({en,de,fr,es} by
    * stopword evidence, zh by CJK script presence); 'und' when no evidence.
    * Ties break deterministically (max score, then lexicographically max
    * language code) via struct-ordered `array_max`.
    */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scored = array(stopwords.keys.toSeq.sorted.map { l =>
      struct(stopwordHits(toks, l).as("score"), lit(l).as("lang"))
    }: _*)
    val best = array_max(scored)
    when(text.rlike("[\\u4e00-\\u9fff]"), "zh")
      .when(best.getField("score") === 0, "und")
      .otherwise(best.getField("lang"))
  }

  // --- quality scoring ----------------------------------------------------

  /** Ratio of punctuation characters to total characters (0 for empty). */
  def punctRatio(text: Column): Column = {
    val n = length(text)
    when(n === 0, 0.0).otherwise(
      (n - length(regexp_replace(text, "[!-/:-@\\[-`{-~]", ""))).cast("double") / n)
  }

  /** Ratio of tokens that are English stopwords — a natural-language-ness
    * signal (boilerplate/code scores near 0).
    */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, 0.0)
      .otherwise(stopwordHits(toks, "en").cast("double") / size(toks))
  }

  /** Mean token length in characters. */
  def meanTokenLen(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, 0.0).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks))
  }

  /** Composite document quality score in [0,1]: length band + token-shape
    * band + punctuation sanity + stopword evidence, equally weighted.
    * (Heuristics after C4/Gopher-style rule filters; weights are
    * documented constants, not learned.)
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text)
    val lenOk = when(nTok.between(10, 100000), 1.0).otherwise(0.0)
    val shapeOk = when(meanTokenLen(text).between(3.0, 12.0), 1.0).otherwise(0.0)
    val punctOk = when(punctRatio(text) <= 0.2, 1.0).otherwise(0.0)
    val stopOk = when(stopwordRatio(text) >= 0.05, 1.0).otherwise(0.0)
    (lenOk + shapeOk + punctOk + stopOk) / 4.0
  }

  // --- repetition (Gopher-style duplicate-content filters) ----------------

  /** Share of tokens taken by the single most frequent token (0 for empty
    * text) — the 1-gram form of Gopher's top-n-gram-share family:
    * looped/templated/SEO text repeats one term far above natural-language
    * frequencies. Per-doc O(distinct × n) HOF arithmetic, scan-side —
    * cost is per document, never cross-document, so the filter rides the
    * ingest scan at any corpus size.
    */
  def topTokenShare(text: Column): Column =
    hof.bind(tokens(text)) { tk =>
      when(size(tk) === 0, lit(0.0)).otherwise(
        array_max(transform(array_distinct(tk), t =>
          size(filter(tk, x => x === t)))).cast("double") / size(tk))
    }

  /** Fraction of token bigrams that repeat an earlier bigram (0 below two
    * tokens) — Gopher's duplicate-n-gram fraction at n = 2, the classic
    * "model loops" / boilerplate detector. Same scan-side shape as
    * [[topTokenShare]].
    */
  def dupBigramFraction(text: Column): Column =
    hof.bind(tokens(text)) { tk =>
      when(size(tk) < 2, lit(0.0)).otherwise(
        hof.bind(transform(sequence(lit(1), size(tk) - 1), i =>
          concat_ws(" ", element_at(tk, i), element_at(tk, i + 1)))) { bg =>
          lit(1.0) - size(array_distinct(bg)).cast("double") / size(bg)
        })
    }

  // --- PII scrubbing ------------------------------------------------------

  /** Redaction patterns, deliberately RE2-compatible (no backrefs, no
    * lookaround) so the DuckDB oracle evaluates the identical regexes.
    */
  private[graft] val piiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "[EMAIL]",
    "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"                -> "[PHONE]",
    "\\b\\d{3}-\\d{2}-\\d{4}\\b"                      -> "[SSN]")

  /** Training-corpus PII scrub: emails, phone-shaped and SSN-shaped
    * numbers replaced with typed placeholders. Scan-side regexp_replace
    * chain — no shuffle, codegen-friendly. (Pattern-based scrubbing is a
    * FILTERING heuristic, not a compliance guarantee.)
    */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (pat, tag)) => regexp_replace(c, pat, tag) }

  /** Per-category PII hit counts (pre-redaction evidence for filtering
    * decisions): (n_emails, n_phones, n_ssns).
    */
  def piiCounts(text: Column): Column = struct(
    size(regexp_extract_all(text, lit(piiPatterns(0)._1), lit(0))).as("n_emails"),
    size(regexp_extract_all(text, lit(piiPatterns(1)._1), lit(0))).as("n_phones"),
    size(regexp_extract_all(text, lit(piiPatterns(2)._1), lit(0))).as("n_ssns"))

  // --- normalization -------------------------------------------------------

  /** Ingest text normalization: lowercase, strip control characters,
    * strip URLs and emails, collapse spaces, trim — the standard cleanup
    * pass before tokenization/shingling. Scan-side regexp_replace chain
    * (no shuffle, codegen-friendly).
    *
    * Engine-portability contract: NO `\s` anywhere — Java's `\s` includes
    * vertical tab (\x0B) while RE2's does not, so a `\s`-based pattern
    * silently diverges between Spark and an RE2 engine (DuckDB) on
    * control-char-adjacent URLs. Instead the control strip runs FIRST
    * (turning every ASCII control char, \x0B included, into a space), and
    * the URL/collapse patterns then only need the literal space class,
    * which every regex dialect agrees on. Order is part of the contract.
    */
  def normalizeText(text: Column): Column = {
    val lowered = lower(text)
    val noCtl = regexp_replace(lowered, "[\\x00-\\x1f\\x7f]", " ")
    val noUrl = regexp_replace(noCtl, "https?://[^ ]+", " ")
    val noEmail = regexp_replace(noUrl, "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", " ")
    trim(regexp_replace(noEmail, " +", " "))
  }

  /** Canonical form of an http(s) URL — the first-pass dedup key of a
    * web corpus (near-identical pages re-crawled under tracking-decorated
    * or case-varied URLs dominate raw crawl duplicates, and collapsing
    * them is pure string math, no content hashing):
    *
    *   1. fragment dropped (`#…` never reaches the server);
    *   2. scheme+host lowercased (case-insensitive per RFC 3986) and a
    *      default `:443` port dropped — the PATH keeps its case, which
    *      IS significant;
    *   3. a trailing `/` on the path dropped;
    *   4. tracking query parameters (`utm_*`, `gclid`, `fbclid`)
    *      removed; surviving parameters keep their original order.
    *
    * Scan-side regexp/HOF chain — no UDF, codegen-friendly, and every
    * step is expressible verbatim in ANSI-ish SQL (the q_t15 oracle
    * replays it). Deliberately NOT done: param re-sorting (changes
    * semantics for order-sensitive endpoints) and percent-decoding
    * (decoding can change which bytes are delimiters).
    */
  def canonicalizeUrl(url: Column): Column = hof.bind(
    regexp_replace(url, "#.*$", "")) { u =>
    val schemeHost = lower(regexp_extract(u, "(?i)^(https?://[^/?]*)", 1))
    val noPort = regexp_replace(schemeHost, ":443$", "")
    val path = regexp_replace(
      regexp_extract(u, "(?i)^https?://[^/?]*([^?]*)", 1), "/$", "")
    val query = regexp_extract(u, "\\?(.*)$", 1)
    val kept = array_join(
      filter(split(query, "&"), p => !p.rlike("^(utm_[a-z]+|gclid|fbclid)=")),
      "&")
    concat(noPort, path, when(kept === "", lit("")).otherwise(concat(lit("?"), kept)))
  }

  // --- fingerprinting (winnowing over rolling hashes) ---------------------

  /** Character k-gram shingles of normalized text. The normalized string
    * is `bind`-bound: referenced from the per-position lambda it would
    * otherwise be recomputed per shingle (see [[hof.bind]]).
    */
  def charShingles(text: Column, k: Int): Column =
    hof.bind(lower(trim(text))) { t =>
      when(length(t) < k, array(t))
        .otherwise(transform(sequence(lit(1), length(t) - (k - 1)), i => substring(t, i, lit(k))))
    }

  /** Token k-gram (word n-gram) shingles; token array bound once. */
  def tokenShingles(text: Column, k: Int): Column =
    hof.bind(tokens(text)) { toks =>
      when(size(toks) < k, array(concat_ws(" ", toks)))
        .otherwise(
          transform(sequence(lit(0), size(toks) - k), i =>
            concat_ws(" ", slice(toks, i + 1, lit(k)))))
    }

  /** Winnowing document fingerprint (Schleimer et al., SIGMOD'03): hash
    * every k-gram, take the min hash of each sliding window of `w`
    * consecutive k-grams, dedup. Robust to local edits; output is a small
    * sorted set of 64-bit fingerprints suitable for an inverted index.
    *
    * The hash array is `bind`-bound: the windowed min references it from a
    * lambda, which unbound is O(n²) re-evaluation (30× slower measured).
    */
  def winnowingFingerprint(text: Column, k: Int = 5, w: Int = 4): Column =
    winnowingFingerprintWith(text, k, w, xxhash64(_))

  /** [[winnowingFingerprint]] generalized over the k-gram hash. */
  def winnowingFingerprintWith(
      text: Column, k: Int, w: Int, hashFn: Column => Column): Column =
    hof.bind(transform(charShingles(text, k), s => hashFn(s))) { hashes =>
      val mins = when(size(hashes) <= w, array(array_min(hashes)))
        .otherwise(
          transform(sequence(lit(0), size(hashes) - w), i =>
            array_min(slice(hashes, i + 1, lit(w)))))
      array_sort(array_distinct(mins))
    }

  /** Engine-portable winnowing fingerprint: md5-derived 60-bit k-gram
    * hashes ([[Hashing.md5Hash60]]) so the gate query's DuckDB oracle can
    * replay the identical arithmetic; xxhash64 stays the production path.
    */
  def winnowingFingerprintPortable(text: Column, k: Int = 5, w: Int = 4): Column =
    winnowingFingerprintWith(text, k, w, Hashing.md5Hash60)
}
