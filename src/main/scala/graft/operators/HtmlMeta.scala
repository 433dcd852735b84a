package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.hof

/** HTML document METADATA extraction — the per-page header plane a web
  * corpus keeps alongside the extracted text ([[HtmlExtract]] takes the
  * body; this takes the head): title for display/dedup hints, meta
  * description for snippeting, the canonical link for URL-level dedup
  * (a page declaring `rel=canonical` collapses onto its canonical
  * target BEFORE any content pass), `og:title` as the social-card
  * variant, and the declared document language as a weak prior for
  * [[TrainedLangId]].
  *
  * Same regex-level discipline as [[HtmlExtract]]/[[LinkExtract]]
  * (RE2-safe, oracle-replayable), with the same documented tag-soup
  * boundaries:
  *   - attribute pairs match in EITHER order (`name=… content=…` or
  *     `content=… name=…`), double- or single-quoted values; BARE
  *     (unquoted) content values are out of scope — vanishingly rare
  *     for prose attributes, and a bare-value regex would mis-slice on
  *     `/>`;
  *   - the FIRST match wins per field (the effective-first rule
  *     browsers apply to title/canonical);
  *   - title text is entity-decoded and whitespace-collapsed; absent
  *     fields are NULL, not empty strings.
  *
  * Scale shape: six anchored `regexp_extract`s per document, all
  * scan-side — no explode, no join, no shuffle until the consumer
  * aggregates.
  *
  * Reference scope note: the reference ingests relational rows and has
  * no markup stage; this is beyond-reference LLM-pipeline surface.
  */
object HtmlMeta {

  /** RE2 has no lookahead — the attr-before-selector order is matched
    * by capturing the value and requiring the selector AFTER it in the
    * same tag, spelled without `(?=…)`.
    */
  private def selectedAttrBefore(
      html: Column, tag: String, selAttr: String, selVal: String,
      attr: String): Column = {
    val sel = s"\\b$selAttr\\s*=\\s*[\"']?$selVal[\"']?"
    val dq = regexp_extract(html,
      s"(?is)<$tag\\b[^>]*?\\b$attr\\s*=\\s*\"([^\"]*)\"[^>]*?$sel", 1)
    val sq = regexp_extract(html,
      s"(?is)<$tag\\b[^>]*?\\b$attr\\s*=\\s*'([^']*)'[^>]*?$sel", 1)
    when(dq =!= "", dq).otherwise(sq)
  }

  private def field(
      html: Column, tag: String, selAttr: String, selVal: String,
      attr: String): Column = {
    def grabAfter(prefix: String): Column = {
      val dq = regexp_extract(html, prefix + "\"([^\"]*)\"", 1)
      val sq = regexp_extract(html, prefix + "'([^']*)'", 1)
      when(dq =!= "", dq).otherwise(sq)
    }
    val sel = s"\\b$selAttr\\s*=\\s*[\"']?$selVal[\"']?"
    val after =
      grabAfter(s"(?is)<$tag\\b[^>]*?$sel[^>]*?\\b$attr\\s*=\\s*")
    val before = selectedAttrBefore(html, tag, selAttr, selVal, attr)
    hof.bind(when(after =!= "", after).otherwise(before)) { v =>
      when(v =!= "", v)
    }
  }

  /** (idCol, title, description, canonical, og_title, lang) — NULLs
    * for absent fields.
    */
  def meta(df: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val h = coalesce(col(htmlCol), lit(""))
    val titleRaw = regexp_extract(h, "(?is)<title[^>]*>(.*?)</title>", 1)
    val title = hof.bind(
      trim(regexp_replace(
        HtmlExtract.decodeEntities(titleRaw), "\\s+", " "))) { t =>
      when(t =!= "", t)
    }
    val langRaw =
      regexp_extract(h, "(?is)<html\\b[^>]*?\\blang\\s*=\\s*[\"']?([A-Za-z][A-Za-z0-9-]*)", 1)
    df.select(
      col(idCol),
      title.as("title"),
      field(h, "meta", "name", "description", "content")
        .as("description"),
      field(h, "link", "rel", "canonical", "href").as("canonical"),
      field(h, "meta", "property", "og:title", "content").as("og_title"),
      hof.bind(langRaw)(l => when(l =!= "", l)).as("lang"))
  }
}
