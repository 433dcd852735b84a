package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Canonical-link dedup — URL-level corpus collapse BEFORE any content
  * pass: a page declaring `<link rel=canonical>` states "I am a copy
  * of that URL" (print views, mobile mirrors, session-id variants), so
  * a web corpus groups pages by their RESOLVED canonical target and
  * keeps one representative per group. Cheaper and earlier than any
  * content dedup: it needs only the page head ([[HtmlMeta]]), not the
  * body, and it catches template-identical variants whose extracted
  * text differs (ads, timestamps) — exactly the near-dup class content
  * hashing misses.
  *
  * Rules (all documented, oracle-replayable):
  *   - the canonical href resolves against the page URL
  *     ([[LinkExtract.resolve]] — it may be relative) and canonicalizes
  *     ([[UrlOps.canonicalize]]); a page with no canonical, or an
  *     unresolvable one, is its own group (group key = its own
  *     canonical page URL);
  *   - the representative is the page whose OWN canonicalized URL
  *     equals the group key if present (the canonical target itself),
  *     else the smallest (url_canon, id) — deterministic under any
  *     partitioning;
  *   - every input row survives with (group key, is_kept) — the caller
  *     filters, counts, or audits; nothing is silently dropped.
  *
  * Scale shape: head-plane extraction + resolution is scan-side; the
  * collapse is ONE per-group window (partition width = pages declaring
  * one canonical target — site-bounded, never corpus-bounded).
  */
object CanonicalDedup {

  /** (idCol, url_canon, canonical_key, is_self, is_kept) — group and
    * keep-decision per page; filter on `is_kept` for the deduped
    * corpus.
    */
  def collapse(
      pages: DataFrame, idCol: String, urlCol: String, htmlCol: String)
      : DataFrame = {
    val selfCanon = UrlOps.canonicalize(col(urlCol))
    // single-pass shape: the canonical-link extraction runs INLINE in
    // the same projection (the [[HtmlMeta]] regex pair), not as a join
    // canonicalize("") is "" (not NULL) — guard the declared key so an
    // absent/unresolvable canonical genuinely falls back to self
    val declaredKey = graft.functions.hof.bind(
      LinkExtract.resolve(col(urlCol), htmlCanonical(htmlCol))) { r =>
      when(r.isNotNull, UrlOps.canonicalize(r))
    }
    val withKey = pages.select(
      col(idCol),
      selfCanon.as("url_canon"),
      coalesce(declaredKey, selfCanon).as("canonical_key"))
    val w = Window.partitionBy(col("canonical_key"))
      .orderBy(col("__self_rank"), col("url_canon"), col(idCol))
    withKey
      .withColumn("is_self",
        (col("url_canon") === col("canonical_key")))
      .withColumn("__self_rank", when(col("is_self"), 0).otherwise(1))
      .withColumn("is_kept", row_number().over(w) === 1)
      .select(col(idCol), col("url_canon"), col("canonical_key"),
        col("is_self"), col("is_kept"))
  }

  private def htmlCanonical(htmlCol: String) = {
    val h = coalesce(col(htmlCol), lit(""))
    val dq = regexp_extract(h,
      "(?is)<link\\b[^>]*?\\brel\\s*=\\s*[\"']?canonical[\"']?[^>]*?\\bhref\\s*=\\s*\"([^\"]*)\"", 1)
    val sq = regexp_extract(h,
      "(?is)<link\\b[^>]*?\\brel\\s*=\\s*[\"']?canonical[\"']?[^>]*?\\bhref\\s*=\\s*'([^']*)'", 1)
    val dq2 = regexp_extract(h,
      "(?is)<link\\b[^>]*?\\bhref\\s*=\\s*\"([^\"]*)\"[^>]*?\\brel\\s*=\\s*[\"']?canonical[\"']?", 1)
    val sq2 = regexp_extract(h,
      "(?is)<link\\b[^>]*?\\bhref\\s*=\\s*'([^']*)'[^>]*?\\brel\\s*=\\s*[\"']?canonical[\"']?", 1)
    graft.functions.hof.bind(
      when(dq =!= "", dq).when(sq =!= "", sq)
        .when(dq2 =!= "", dq2).otherwise(sq2)) { v =>
      when(v =!= "", v)
    }
  }
}
