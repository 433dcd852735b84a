package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Crawl-trap detection — the frontier's self-defense: calendar pages,
  * session-id echoes and faceted-search grids generate unbounded URL
  * spaces under ONE path shape, and a crawler that can't see the shape
  * spends its politeness budget fetching the same template forever.
  * The standard counter is template concentration: collapse every path
  * to its TEMPLATE (hex runs → `H` first — hex contains digits — then
  * digit runs → `N`), and flag hosts whose frontier concentrates past
  * a threshold in one template.
  *
  * The verdict is EXACT integer arithmetic (the repo's no-division
  * discipline): `is_trap ⇔ n_urls ≥ minUrls AND
  * top_count · 100 ≥ thresholdPct · n_urls`. The top template
  * tie-breaks deterministically (count, then lexicographically
  * GREATEST template — the max-of-struct order, stable across
  * partitionings and engines).
  *
  * Scale shape: template is one scan-side regex chain; the report is
  * two hash aggregates (host×template, then host) — the host-level
  * frame is frontier-bounded. A genuinely trapped host has a huge
  * (host, template) group, which the partial aggregation collapses
  * map-side; nothing is corpus-wide.
  */
object TrapDetect {

  /** Path template: hex runs (≥8) → `H`, then digit runs → `N`. */
  def template(path: Column): Column =
    regexp_replace(
      regexp_replace(coalesce(path, lit("")), "(?i)[0-9a-f]{8,}", "H"),
      "[0-9]+", "N")

  /** Per-host report over a (host, url) frontier:
    * (host, n_urls, n_templates, top_template, top_count, is_trap).
    * Distinct URLs only — a frontier duplicate is not evidence.
    */
  def report(
      frontier: DataFrame,
      hostCol: String,
      urlCol: String,
      minUrls: Int = 10,
      thresholdPct: Int = 50): DataFrame = {
    require(minUrls >= 1, "minUrls must be positive")
    require(thresholdPct >= 1 && thresholdPct <= 100,
      "thresholdPct must be in [1, 100]")
    val path = regexp_replace(col(urlCol),
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    val perTemplate = frontier
      .select(col(hostCol).as("host"), col(urlCol).as("url"))
      .distinct()
      .select(col("host"), template(path).as("__tmpl"))
      .groupBy("host", "__tmpl")
      .agg(count(lit(1)).as("__cnt"))
    perTemplate
      .groupBy("host")
      .agg(
        sum(col("__cnt")).as("n_urls"),
        count(lit(1)).as("n_templates"),
        max(struct(col("__cnt").as("c"), col("__tmpl").as("t")))
          .as("__top"))
      .select(
        col("host"), col("n_urls"), col("n_templates"),
        col("__top.t").as("top_template"),
        col("__top.c").as("top_count"),
        (col("n_urls") >= minUrls &&
          col("__top.c") * 100 >= col("n_urls") * thresholdPct)
          .as("is_trap"))
  }
}
