package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-host politeness scheduling — the step between a governed
  * frontier ([[Robots]]/[[Sitemap]]/[[LinkExtract]]) and the fetcher
  * fleet: a crawler may hit one host only every `Crawl-delay` seconds
  * ([[Robots.meta]]), so each host's URLs serialize into fetch slots
  * while hosts proceed in parallel — the host-level makespan, not the
  * URL count, bounds wall-clock.
  *
  * Slot order within a host is the DETERMINISTIC content hash of the
  * URL (md5 — the [[UrlOps.domainCap]] discipline: stable under any
  * partitioning, no arrival-order dependence), and scheduling is over
  * the DISTINCT (host, url) set — a frontier duplicate must not burn
  * two slots.
  *
  * Scale shape: one distinct + one per-host window (partition width =
  * URLs of one host — frontier-bounded, never corpus-bounded) + a
  * per-host delay join that reuses the same hash distribution; the
  * report is one hash aggregate. A pathological single-host frontier
  * skews the window partition — that host IS the crawl bottleneck the
  * report surfaces, and the engine-side cost mirrors the real-world
  * constraint.
  *
  * Reference scope note: the reference polls a REST API with no rate
  * plan; this is part of the beyond-reference crawl surface.
  */
object CrawlSchedule {

  /** Schedule the DISTINCT (host, url) frontier: (host, url, delay_sec,
    * fetch_seq, fetch_at_sec) — fetch k of a host fires at
    * `k * delay_sec`, delay from the host's resolved Crawl-delay
    * (`delays`: host → seconds, NULL/absent → `defaultDelaySec`).
    */
  def schedule(
      frontier: DataFrame,
      hostCol: String,
      urlCol: String,
      delays: DataFrame,
      delayHostCol: String,
      delayCol: String,
      defaultDelaySec: Int = 1): DataFrame = {
    require(defaultDelaySec >= 0, "defaultDelaySec must be >= 0")
    val d = delays.select(
      col(delayHostCol).as(hostCol),
      col(delayCol).cast("long").as("__d"))
    val w = Window.partitionBy(col(hostCol))
      .orderBy(md5(col(urlCol).cast("binary")), col(urlCol))
    frontier.select(col(hostCol), col(urlCol)).distinct()
      .join(d, Seq(hostCol), "left")
      .select(col(hostCol), col(urlCol),
        coalesce(col("__d"), lit(defaultDelaySec.toLong)).as("delay_sec"),
        (row_number().over(w) - 1).cast("int").as("fetch_seq"))
      .withColumn("fetch_at_sec", col("fetch_seq") * col("delay_sec"))
  }

  /** Per-host readout over a [[schedule]]d frontier: (host, n_urls,
    * delay_sec, makespan_sec) — `makespan_sec` is the last slot's
    * offset; the crawl's wall-clock bound is its max over hosts.
    */
  def hostReport(scheduled: DataFrame, hostCol: String): DataFrame =
    scheduled.groupBy(col(hostCol))
      .agg(count(lit(1)).as("n_urls"),
        max(col("delay_sec")).as("delay_sec"),
        max(col("fetch_at_sec")).as("makespan_sec"))
}
