package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sitemap XML parsing (sitemaps.org protocol) — the crawl frontier's
  * OTHER discovery channel next to robots.txt: a landing zone fetches
  * `/sitemap.xml` per host, and each body is either a `<urlset>` (loc
  * + optional lastmod per `<url>`) or a `<sitemapindex>` delegating to
  * child sitemaps (one bounded nesting level per the protocol — an
  * index may not reference another index). The reference has no crawl
  * surface at all; this is extension surface for the corpus pipeline,
  * composing with [[Robots]] so the emitted frontier is GOVERNED.
  *
  * Parsing rides Spark's NATIVE XML support (`from_xml`, the merged
  * spark-xml datasource — the q_s6 machinery applied to in-plan
  * strings): one combined schema covers both root shapes, since a
  * urlset populates `url[]` and a sitemapindex populates `sitemap[]`.
  * Bodies that fail XML parse, or parse to neither shape, classify
  * `invalid` and contribute NO frontier rows (the quarantine posture:
  * a landing zone does not guess).
  *
  * Scale shape: `from_xml` is one scan-side expression per body; the
  * index level resolves with ONE self-equi-join on (host, sitemap
  * url) — never a recursive walk — and [[Robots.decide]] already runs
  * its rule argmax per DISTINCT (host, path). No driver-side
  * collection anywhere; everything is per-host partitionable.
  */
object Sitemap {

  /** Both root shapes in one schema: `<urlset>` fills `url`,
    * `<sitemapindex>` fills `sitemap`.
    */
  private val xmlSchema = StructType(Seq(
    StructField("url", ArrayType(StructType(Seq(
      StructField("loc", StringType),
      StructField("lastmod", StringType))))),
    StructField("sitemap", ArrayType(StructType(Seq(
      StructField("loc", StringType),
      StructField("lastmod", StringType)))))))

  /** Parse each body: input columns + (kind ∈ urlset|sitemapindex|
    * invalid, entries: array<struct<loc, lastmod>>) — `entries` are
    * page locs for a urlset, CHILD-SITEMAP locs for an index.
    */
  def parse(df: DataFrame, bodyCol: String): DataFrame =
    df.withColumn("__x",
      from_xml(col(bodyCol), xmlSchema,
        Map("mode" -> "PERMISSIVE").asJava))
      .withColumn("kind",
        when(col("__x").isNotNull && col("__x.url").isNotNull &&
          size(col("__x.url")) >= 1, "urlset")
          .when(col("__x").isNotNull && col("__x.sitemap").isNotNull &&
            size(col("__x.sitemap")) >= 1, "sitemapindex")
          .otherwise("invalid"))
      .withColumn("entries",
        when(col("kind") === "urlset", col("__x.url"))
          .when(col("kind") === "sitemapindex", col("__x.sitemap")))
      .drop("__x")

  private implicit class MapOps(m: Map[String, String]) {
    def asJava: java.util.Map[String, String] = {
      val jm = new java.util.HashMap[String, String]()
      m.foreach { case (k, v) => jm.put(k, v) }
      jm
    }
  }

  /** The frontier frame: one row per `<url>` entry of every VALID
    * urlset — (host, sitemap_url, via_index, loc, lastmod), where
    * `via_index` flags a urlset referenced by a same-host
    * `<sitemapindex>` in the frame (the one bounded nesting level:
    * index → urlset, resolved as one self-join, never recursion).
    */
  def frontier(
      sitemaps: DataFrame,
      hostCol: String,
      urlCol: String,
      bodyCol: String): DataFrame = {
    val parsed = parse(
      sitemaps.select(col(hostCol).as("host"),
        col(urlCol).as("sitemap_url"), col(bodyCol).as("__body")),
      "__body")
    val indexRefs = parsed
      .filter(col("kind") === "sitemapindex")
      .select(col("host"), explode(col("entries")).as("__e"))
      .select(col("host"), col("__e.loc").as("sitemap_url"))
      .distinct()
      .withColumn("__via", lit(true))
    parsed
      .filter(col("kind") === "urlset")
      .join(indexRefs, Seq("host", "sitemap_url"), "left")
      .select(col("host"), col("sitemap_url"),
        coalesce(col("__via"), lit(false)).as("via_index"),
        explode(col("entries")).as("__e"))
      .select(col("host"), col("sitemap_url"), col("via_index"),
        col("__e.loc").as("loc"), col("__e.lastmod").as("lastmod"))
  }

  /** URL path of a loc (absolute-URL form), "/" when the loc has no
    * path component.
    */
  private def pathOf(loc: Column): Column = {
    val p = regexp_extract(loc, "\\A[A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]*(/[^?#]*)?", 1)
    when(p === "", "/").otherwise(p)
  }

  /** [[frontier]] composed through [[Robots.decide]]: the GOVERNED
    * frontier — (host, sitemap_url, via_index, loc, lastmod, allowed,
    * matched_pattern, matched_allow). Locs on hosts with no robots row
    * come back allowed (the decide() contract).
    */
  def governedFrontier(
      sitemaps: DataFrame,
      hostCol: String,
      urlCol: String,
      bodyCol: String,
      robots: DataFrame,
      robotsHostCol: String,
      robotsBodyCol: String,
      agent: String): DataFrame = {
    val fr = frontier(sitemaps, hostCol, urlCol, bodyCol)
      .withColumn("__path", pathOf(col("loc")))
    Robots.decide(robots, robotsHostCol, robotsBodyCol,
      fr, "host", "__path", agent)
      .select(col("host"), col("sitemap_url"), col("via_index"),
        col("loc"), col("lastmod"),
        col("allowed"), col("matched_pattern"), col("matched_allow"))
  }
}
