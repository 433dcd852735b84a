package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.hof

/** SURT (Sort-friendly URI Reordering Transform) keys and the
  * CDX-style capture index built on them — how a web archive makes a
  * crawl SEEKABLE: captures of the same resource sort adjacently when
  * the host is written most-significant-label-first, so one
  * (surt_key, timestamp)-ordered index answers "every capture of this
  * URL / this domain prefix" with a range scan. Common Crawl publishes
  * exactly this artifact (the CDX index) next to its WARC files.
  *
  * SURT form produced (the classic openwayback canonical key,
  * re-specified here as a fixed RE2 + array-op chain so a SQL oracle
  * replays it exactly):
  *   - lowercase everything (the archive key is case-folded);
  *   - drop the scheme and any `user:pass@` userinfo;
  *   - drop ports 80 and 443 (scheme is gone, so the two web defaults
  *     drop unconditionally — documented boundary: a literal `:80` on
  *     an https capture also drops), keep any other port;
  *   - drop one leading `www` / `www<digits>` label and a trailing
  *     root dot;
  *   - reverse the remaining host labels, comma-joined, then `)`;
  *   - path as-is (empty → `/`), fragment dropped;
  *   - query args sorted bytewise and re-joined with `&` (capture
  *     variants that differ only in arg order collide, by design) —
  *     empty query drops its `?`.
  *
  * Scale shape: `surtKey` is pure scan-side column algebra; the CDX
  * build is the [[WarcGz]] record walk + the [[HttpMessage]] envelope
  * parse INLINE in the same projection (no join — the envelope is a
  * column function), then one sort into index order. At 100 TB the
  * index build is a scan plus the final range-partitioned sort — the
  * same shape Spark gives a `sortWithinPartitions`/global-sort write.
  *
  * Reference scope note: the reference has no archive/index stage;
  * this is part of the beyond-reference LLM-pipeline surface.
  */
object Surt {

  /** The SURT key of a URL (see the object doc for the exact chain). */
  def surtKey(url: Column): Column =
    hof.bind(lower(trim(coalesce(url, lit(""))))) { u0 =>
      hof.bind(
        regexp_replace(
          regexp_replace(u0, "^[a-z][a-z0-9+.-]*://", ""),
          "^[^/?#@]*@", "")) { u =>
        hof.bind(
          regexp_replace(
            regexp_extract(u, "^([^/?#]*)", 1),
            ":(?:80|443)$", "")) { hostport =>
          // a surviving (non-default) port re-attaches AFTER the
          // reversed labels: `com,example:8080)` — the classic key form
          val port = regexp_extract(hostport, "(:[0-9]+)$", 1)
          val host = regexp_replace(
            regexp_replace(
              regexp_replace(hostport, ":[0-9]+$", ""),
              "\\.$", ""),
            "^www[0-9]*\\.", "")
          val rev = concat(
            array_join(reverse(split(host, "\\.")), ","), port)
          hof.bind(
            regexp_replace(
              regexp_replace(u, "^[^/?#]*", ""), "#.*$", "")) { rest =>
            val path0 = regexp_replace(rest, "\\?.*$", "")
            val path = when(path0 === "", "/").otherwise(path0)
            val q = regexp_extract(rest, "\\?(.*)$", 1)
            val qPart = when(q === "", lit("")).otherwise(
              concat(lit("?"), array_join(array_sort(split(q, "&")), "&")))
            concat(rev, lit(")"), path, qPart)
          }
        }
      }
    }

  /** CDX-style capture index over a `.warc.gz` landing frame: walk the
    * gzip members ([[WarcGz.recordsWithText]] — CRC-verified, invalid
    * files quarantined upstream), keep `response` records, crack each
    * payload's HTTP envelope INLINE ([[HttpMessage.parse]], no join),
    * and emit one index row per capture:
    * (surt_key, warc_date, url, mime, status, digest, length, rec_ok)
    * in (surt_key, warc_date, url) order — `digest` is the record's
    * TRUE payload md5 (revisit detection compares it), `mime`/`status`
    * come from the envelope and stay NULL-diagnosed on quarantined
    * envelopes (`rec_ok = false`).
    */
  def cdxIndex(
      df: DataFrame,
      idCol: String,
      gzCol: String,
      maxMembers: Int = 16,
      maxRecordBytes: Int = 1 << 24): DataFrame = {
    val recs = WarcGz
      .recordsWithText(df, idCol, gzCol, maxMembers, maxRecordBytes)
      .where(col("warc_type") === "response")
    recs.select(
      surtKey(col("target_uri")).as("surt_key"),
      col("warc_date"),
      col("target_uri").as("url"),
      hof.bind(HttpMessage.parse(col("payload_text"))) { e =>
        struct(
          e.getField("content_type").as("mime"),
          e.getField("status_code").as("status"),
          e.getField("ok").as("rec_ok"))
      }.as("e"),
      col("payload_md5").as("digest"),
      col("content_length").as("length"))
      .select(col("surt_key"), col("warc_date"), col("url"),
        col("e.mime").as("mime"), col("e.status").as("status"),
        col("digest"), col("length"), col("e.rec_ok").as("rec_ok"))
      .orderBy("surt_key", "warc_date", "url")
  }

  /** Incremental-crawl fetch plan: probe a frontier against the
    * capture index — per frontier URL (keyed by SURT, so spelling
    * variants still match their captures), the LATEST capture per key
    * (max (warc_date, url, digest) — deterministic) decides `new`
    * (never captured — fetch it) vs `seen` (annotated with last_date +
    * last_digest for the caller's refresh policy). One hash aggregate
    * over the index + one join; the index side reduces to one row per
    * key BEFORE the join, so frontier skew never multiplies captures.
    */
  def fetchPlan(
      index: DataFrame, frontier: DataFrame, urlCol: String): DataFrame = {
    val latest = index
      .groupBy("surt_key")
      .agg(max(struct(col("warc_date"), col("url"), col("digest")))
        .as("__l"))
      .select(col("surt_key"), col("__l.warc_date").as("last_date"),
        col("__l.digest").as("last_digest"))
    frontier
      .withColumn("surt_key", surtKey(col(urlCol)))
      .join(latest, Seq("surt_key"), "left")
      .withColumn("status",
        when(col("last_date").isNull, "new").otherwise("seen"))
  }

  /** URL-level revisit dedup over a [[cdxIndex]]-shaped frame — the
    * archive's storage saver: within one surt key, a capture whose
    * payload digest equals the PREVIOUS capture's digest is a REVISIT
    * (store a pointer, not the bytes). Emits the index with
    * `is_revisit`; per-key window ordered by (warc_date, url), width =
    * captures of one URL key.
    */
  def revisits(index: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("surt_key").orderBy("warc_date", "url")
    index.withColumn("is_revisit",
      coalesce(lag(col("digest"), 1).over(w) === col("digest"),
        lit(false)))
  }
}
