package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) record walk — the container format of web corpora
  * (Common Crawl ships as WARC): one cell holds a record group, and the
  * walk recovers each record's headers and payload digest the way the
  * [[Multimodal]] container family walks tar/MP4 — CONTENT-LENGTH
  * DRIVEN, never by searching payloads for magic strings (a payload may
  * legally contain `WARC/1.0`, so delimiter splitting mis-parses by
  * spec; only the declared length walk is correct).
  *
  * Record grammar as walked: `WARC/1.0\r\n` version line, header lines
  * to the first `\r\n\r\n`, `Content-Length` bytes of payload, and the
  * record-terminating `\r\n\r\n`. A file is VALID iff well-formed
  * records consume every byte within the `maxRecords` bound; any
  * malformed tail invalidates the whole file (the tar-meta contract —
  * a landing zone quarantines bad containers, it does not guess).
  *
  * The walk is a bounded fold over column algebra (locate + substr +
  * regexp on the header block only), evaluated per row scan-side —
  * `maxRecords` bounds the group size a landing-zone splitter hands to
  * one cell, the Common Crawl layout. Boundary (documented): offsets
  * are CHARACTER positions, exact for the ASCII/Latin header plane and
  * single-byte payloads; binary payloads ride the binary container
  * kernels in [[Multimodal]].
  */
object Warc {

  private val CRLF2 = "\r\n\r\n"

  private val recType = "struct<rec_idx:int,warc_type:string," +
    "record_id:string,target_uri:string,warc_date:string," +
    "content_length:bigint,payload_md5:string>"

  /** struct(valid: boolean, recs: array<record>) for one WARC cell.
    *
    * Every multiply-read subtree is `hof.bind`-let-bound (the q_m15
    * lesson, hit a FOURTH time here): lambda bodies don't CSE, so an
    * unbound walk re-evaluated the (in-plan constructed) file string at
    * every `locate`/`substr` reference of every step — 63 s for the
    * capped gate corpus; bound it prices like the other container
    * walks.
    */
  def walk(s0: Column, maxRecords: Int): Column = {
    require(maxRecords >= 1 && maxRecords <= 64,
      "maxRecords must be in [1, 64] (one landing-zone record group)")
    graft.functions.hof.bind(coalesce(s0, lit(""))) { s =>
      val init = struct(
        lit(1L).as("pos"),
        lit(true).as("ok"),
        array().cast(s"array<$recType>").as("recs"))
      val folded = aggregate(
        sequence(lit(1), lit(maxRecords)),
        init,
        (acc, _) => {
          val pos = acc.getField("pos")
          val ok = acc.getField("ok")
          val recs = acc.getField("recs")
          val atEnd = pos > length(s)
          val verOk = s.substr(pos, lit(10L)) === lit("WARC/1.0\r\n")
          graft.functions.hof.bind(
            call_function("locate", lit(CRLF2), s, pos).cast("long")) { hEnd =>
            graft.functions.hof.bind(
              s.substr(pos, greatest(hEnd - pos, lit(0L)))) { headers =>
              // header names match case-insensitively with optional
              // whitespace after the colon (spec-legal `content-length:42`
              // parses; previously only `Content-Length: 42` did — the
              // r15 ADVICE tolerance fix). Keys are literal here
              // (letters/hyphens only), so no regex-quoting is needed.
              def h(key: String): Column =
                regexp_extract(headers,
                  "(?i)(?:^|\r\n)" + key + ":[ \t]*([^\r\n]*)", 1)
              // digits-gated before the cast: ANSI mode faults a bare
              // cast of a missing/garbage header ('' -> BIGINT)
              val clStr = h("Content-Length")
              graft.functions.hof.bind(
                when(clStr.rlike("^[0-9]{1,15}$"), clStr.cast("long"))) { cl =>
                val trailerFits = hEnd + lit(7L) + cl <= length(s)
                val trailerOk =
                  s.substr(hEnd + lit(4L) + cl, lit(4L)) === lit(CRLF2)
                val stepOk = ok && !atEnd && verOk && hEnd > 0 &&
                  cl.isNotNull && cl >= 0 && trailerFits && trailerOk
                val rec = struct(
                  size(recs).as("rec_idx"),
                  h("WARC-Type").as("warc_type"),
                  h("WARC-Record-ID").as("record_id"),
                  h("WARC-Target-URI").as("target_uri"),
                  h("WARC-Date").as("warc_date"),
                  cl.as("content_length"),
                  md5(s.substr(hEnd + lit(4L), greatest(cl, lit(0L)))
                    .cast("binary")).as("payload_md5"))
                struct(
                  when(stepOk, hEnd + lit(8L) + cl).otherwise(pos).as("pos"),
                  (ok && (atEnd || stepOk)).as("ok"),
                  when(stepOk, concat(recs, array(rec))).otherwise(recs)
                    .as("recs"))
              }
            }
          }
        })
      struct(
        (folded.getField("ok") &&
          folded.getField("pos") === length(s) + lit(1L)).as("valid"),
        folded.getField("recs").as("recs"))
    }
  }

  /** One row per record of each VALID file:
    * (file_id, rec_idx, warc_type, record_id, target_uri, warc_date,
    * content_length, payload_md5). Invalid files contribute no rows —
    * read [[fileSummary]] for the quarantine ledger.
    */
  def records(
      df: DataFrame,
      idCol: String,
      warcCol: String,
      maxRecords: Int = 16): DataFrame =
    df.select(col(idCol).as("file_id"), walk(col(warcCol), maxRecords).as("w"))
      .filter(col("w.valid"))
      .select(col("file_id"), explode(col("w.recs")).as("r"))
      .select(col("file_id"), col("r.rec_idx").as("rec_idx"),
        col("r.warc_type").as("warc_type"),
        col("r.record_id").as("record_id"),
        col("r.target_uri").as("target_uri"),
        col("r.warc_date").as("warc_date"),
        col("r.content_length").as("content_length"),
        col("r.payload_md5").as("payload_md5"))

  /** Per-file ledger: (file_id, valid, n_records, total_payload). */
  def fileSummary(
      df: DataFrame,
      idCol: String,
      warcCol: String,
      maxRecords: Int = 16): DataFrame =
    df.select(col(idCol).as("file_id"), walk(col(warcCol), maxRecords).as("w"))
      .select(
        col("file_id"),
        col("w.valid").as("valid"),
        when(col("w.valid"), size(col("w.recs"))).otherwise(lit(0))
          .cast("int").as("n_records"),
        when(col("w.valid"),
          coalesce(aggregate(col("w.recs"), lit(0L),
            (a, r) => a + r.getField("content_length")), lit(0L)))
          .otherwise(lit(0L)).as("total_payload"))
}
