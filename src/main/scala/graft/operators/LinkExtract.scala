package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Outlink extraction + RFC 3986 relative-reference resolution — the
  * stage between [[HtmlExtract]] (what a fetched page SAYS) and the
  * crawl frontier (what to fetch NEXT): every `<a href>` on a page is a
  * candidate frontier entry, but raw href values are dominated by
  * relative references (`../x`, `/y`, `//cdn.z`, `?page=2`) that only
  * mean something against the page's base URL. Link resolution is also
  * what turns a page corpus into a LINK GRAPH — the input to host-level
  * PageRank / frontier prioritization.
  *
  * Extraction (the [[HtmlExtract]] regex-level discipline — RE2-safe,
  * oracle-replayable):
  *   - `<a ... href=V>` with V double-quoted, single-quoted or bare;
  *     the attribute match is case-insensitive and tolerates whitespace
  *     around `=`; quotes are stripped afterwards with one bounded
  *     replace per value;
  *   - the FIRST `<base href>` in the document, if any, overrides the
  *     page URL as the resolution base (HTML spec: only the first base
  *     is effective);
  *   - values inside comments/scripts are NOT excluded (regex-level
  *     stripper boundary, documented — same posture as
  *     [[HtmlExtract.textify]]'s tag-soup caveats).
  *
  * Resolution (RFC 3986 §5.2, the http(s) subset):
  *   - an absolute reference (`scheme://…`) wins as-is;
  *   - `//authority…` takes the base's scheme (protocol-relative);
  *   - `/path…` takes the base's origin (scheme://authority);
  *   - `?query` replaces the base's query, keeping its path;
  *   - a bare relative path merges onto the base path's directory
  *     (§5.3 merge), then dot segments are removed (§5.2.4) as a
  *     BOUNDED chain of RE2 passes — nesting up to
  *     [[LinkExtract.dotSegmentPasses]] levels of `..` resolves
  *     exactly; deeper nesting (vanishingly rare in real markup) leaves
  *     the residue literal rather than looping unboundedly, the
  *     documented bound. `..` climbing past the root clamps at the
  *     root, per the RFC's remove_dot_segments;
  *   - fragment-only (`#…`) and empty references are self-links, not
  *     outlinks → NULL; non-fetchable schemes (`javascript:` `mailto:`
  *     `data:` `tel:`) → NULL; any resulting fragment is dropped (a
  *     fragment never names a distinct resource).
  *
  * Scale shape: everything is scan-side — one `regexp_extract_all` +
  * `posexplode` per page and a fixed replace chain per href; no join,
  * no shuffle until the consumer aggregates. The host graph is one
  * hash aggregate on (src_host, dst_host). At 100 TB this runs at
  * parquet-scan speed, like the rest of the HTML family.
  *
  * Reference scope note: the reference ingests relational rows
  * (banner-connector/ sql dir) and has no web-crawl stage; this is
  * part of the beyond-reference LLM-pipeline surface.
  */
object LinkExtract {

  /** Levels of `/seg/../` nesting the bounded remove_dot_segments
    * chain resolves exactly.
    */
  val dotSegmentPasses = 6

  /** A path segment that is NOT `..` (RE2 has no lookaround, so the
    * complement is spelled out: starts with a non-dot; or `.` then a
    * non-dot; or `..` then more; or the single `.`).
    */
  private val notDotDot = "(?:[^/.][^/]*|\\.[^/.][^/]*|\\.\\.[^/]+|\\.)"

  /** Raw href values (quotes stripped, entity-decoded, trimmed) from
    * every anchor tag, in document order.
    */
  def hrefs(html: Column): Column = {
    val raw = regexp_extract_all(
      coalesce(html, lit("")),
      lit("(?is)<a\\b[^>]*?\\shref\\s*=\\s*(\"[^\"]*\"|'[^']*'|[^\\s>]+)"),
      lit(1))
    transform(raw, v =>
      trim(HtmlExtract.decodeEntities(
        regexp_replace(v, "^[\"']|[\"']$", ""))))
  }

  /** The first `<base href>` value in the document, or NULL. */
  def baseHref(html: Column): Column = {
    val v = regexp_extract(
      coalesce(html, lit("")),
      "(?is)<base\\b[^>]*?\\shref\\s*=\\s*(\"[^\"]*\"|'[^']*'|[^\\s>]+)", 1)
    graft.functions.hof.bind(
      trim(regexp_replace(v, "^[\"']|[\"']$", ""))) { stripped =>
      when(stripped =!= "", stripped)
    }
  }

  /** §5.2.4 remove_dot_segments over a path that starts with `/`:
    * collapse `/./` runs, then peel `/seg/../` innermost-first for
    * [[dotSegmentPasses]] passes, clamp root-escaping `/../` at `/`,
    * and resolve a trailing `/.` or `/seg/..`.
    */
  private def removeDotSegments(path: Column): Column = {
    val noDot0 = regexp_replace(path, "(?:/\\.)+/", "/")
    val noDot = regexp_replace(noDot0, "(?:/\\.)+$", "/")
    val peeled = (1 to dotSegmentPasses).foldLeft(noDot) { (p, _) =>
      regexp_replace(
        regexp_replace(p, s"/$notDotDot/\\.\\./", "/"),
        s"/$notDotDot/\\.\\.$$", "/")
    }
    regexp_replace(peeled, "^(?:/\\.\\.)+(/|$)", "/")
  }

  /** Resolve one reference against an ABSOLUTE http(s) base URL.
    * Returns NULL for self-links (empty / fragment-only) and
    * non-fetchable schemes; otherwise an absolute, fragment-free URL.
    *
    * Every derived piece (trimmed ref, fragment-free ref, origin,
    * base path) is `hof.bind`-bound so it evaluates ONCE — inlined,
    * the when-chain references each up to 7× and CollapseProject
    * multiplies that through any upstream base expression (the
    * recurring hof.bind lesson; unbound, `outlinks` re-ran the whole
    * base-tag resolve per branch).
    */
  def resolve(base: Column, ref: Column): Column =
    graft.functions.hof.bind(trim(coalesce(ref, lit("")))) { r =>
      graft.functions.hof.bind(regexp_replace(r, "#.*$", "")) { noFrag =>
        graft.functions.hof.bind(trim(coalesce(base, lit("")))) { b =>
          graft.functions.hof.bind(
            regexp_extract(b, "^([^:/?#]+://[^/?#]*)", 1)) { origin =>
            val scheme = regexp_extract(b, "^([^:/?#]+):", 1)
            val basePath0 =
              regexp_extract(b, "^[^:/?#]+://[^/?#]*([^?#]*)", 1)
            val basePath = when(basePath0 === "", "/").otherwise(basePath0)
            // directory of the base path: up to and incl. the last '/'
            val baseDir = regexp_replace(basePath, "[^/]*$", "")
            val resolved =
              when(r === "" || r.startsWith("#"), lit(null))
                .when(r.rlike("(?i)^(?:javascript|mailto|data|tel):"),
                  lit(null))
                .when(noFrag.rlike("^[A-Za-z][A-Za-z0-9+.-]*://"), noFrag)
                .when(noFrag.startsWith("//"),
                  concat(scheme, lit(":"), noFrag))
                .when(noFrag.startsWith("/"), concat(origin,
                  removeDotSegments(regexp_replace(noFrag, "\\?.*$", "")),
                  regexp_extract(noFrag, "(\\?.*)$", 1)))
                .when(noFrag.startsWith("?"),
                  concat(origin, basePath, noFrag))
                .otherwise(concat(origin,
                  removeDotSegments(
                    concat(baseDir, regexp_replace(noFrag, "\\?.*$", ""))),
                  regexp_extract(noFrag, "(\\?.*)$", 1)))
            // an absolute reference needs no base; everything else does
            when(origin =!= "" ||
              noFrag.rlike("^[A-Za-z][A-Za-z0-9+.-]*://"), resolved)
          }
        }
      }
    }

  /** Outlinks frame: one row per DISTINCT resolved outlink per page —
    * (idCol, url_raw, url) with `url` the [[UrlOps.canonicalize]]d
    * absolute target. Self-links, non-fetchable schemes and unresolved
    * references drop; a `<base href>` (resolved against the page URL —
    * it may itself be relative) overrides the page URL as base.
    */
  def outlinks(
      df: DataFrame, idCol: String, urlCol: String, htmlCol: String)
      : DataFrame = {
    val pageBase = coalesce(
      resolve(col(urlCol), baseHref(col(htmlCol))), col(urlCol))
    val exploded = df
      .select(col(idCol), col(urlCol), pageBase.as("__base"),
        explode(hrefs(col(htmlCol))).as("url_raw"))
    exploded
      .select(col(idCol), col("url_raw"),
        graft.functions.hof.bind(
          resolve(col("__base"), col("url_raw")))(
          r => UrlOps.canonicalize(r)).as("url"))
      .where(col("url").isNotNull && col("url") =!= "")
      .groupBy(col(idCol), col("url"))
      .agg(min(col("url_raw")).as("url_raw"))
      .select(col(idCol), col("url_raw"), col("url"))
  }

  /** Host-level link graph from an [[outlinks]]-shaped frame joined
    * back to the page URL: (src_host, dst_host, n_links) with
    * self-host edges excluded — the input to PageRank-style frontier
    * prioritization. One hash aggregate; distributes on the host pair.
    */
  def hostGraph(
      pages: DataFrame, idCol: String, urlCol: String, htmlCol: String)
      : DataFrame = {
    val links = outlinks(pages, idCol, urlCol, htmlCol)
    val withSrc = links
      .join(pages.select(col(idCol),
        UrlOps.host(UrlOps.canonicalize(col(urlCol))).as("src_host")),
        Seq(idCol))
    withSrc
      .select(col("src_host"), UrlOps.host(col("url")).as("dst_host"))
      .where(col("dst_host") =!= col("src_host") && col("dst_host") =!= "")
      .groupBy("src_host", "dst_host")
      .agg(count(lit(1)).as("n_links"))
  }
}
