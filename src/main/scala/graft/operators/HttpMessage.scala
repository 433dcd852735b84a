package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.{GzipInflate, ZlibInflate}

/** HTTP/1.x RESPONSE ENVELOPE parse — the layer between a WARC
  * `response` record and the page it captured: Common Crawl payloads
  * are full HTTP messages (status line, headers, body), so the crawl
  * front door must crack the envelope before any text pipeline can
  * start (the r16 VERDICT's top item). The reference never sees HTTP
  * response bytes at all — its REST client receives pre-parsed JSON —
  * so this operator is pure extension surface.
  *
  * Input is the STRING byte-view of the payload (ISO-8859-1, the
  * lossless byte↔char bijection [[WarcGz]] emits): header offsets are
  * byte-exact and body slices re-encode to the original bytes.
  *
  * Message grammar as parsed (RFC 9112 subset):
  *   - status line `HTTP/<d>.<d> <3-digit code> [reason]\r\n`;
  *   - header lines to the first `\r\n\r\n` — names case-insensitive,
  *     optional whitespace after the colon (the [[Warc]] idiom);
  *   - body = the remainder, framed by exactly one of:
  *       `Transfer-Encoding: chunked` → the chunk walk (hex size line
  *       with optional `;ext` chunk extensions, data, CRLF, repeated;
  *       `0`-size terminator, optional trailer header lines, final
  *       CRLF, and the message must END there),
  *       `Content-Length: n` → the remainder must be exactly n bytes,
  *       neither → connection-close delimited (the WARC capture
  *       already bounds it);
  *   - `Content-Encoding: gzip|x-gzip|deflate` then decompresses the
  *     framed body through the native [[graft.expressions.GzipInflate]]
  *     / [[graft.expressions.ZlibInflate]] kernels (CRC-32/adler-32
  *     verified, output bounded BEFORE allocation — the decompression-
  *     bomb guard a 100 TB crawl scan needs); `identity`/absent passes
  *     through; anything else quarantines as unsupported.
  *
  * Malformation is CLASSIFIED, not guessed (the tar-meta contract):
  * `err` is one of `no-header-terminator`, `bad-status-line`,
  * `bad-chunk-framing`, `length-mismatch`, `unsupported-encoding`,
  * `bad-encoded-body` — checked in that order — and `ok` rows carry
  * `err = ''`. Header-plane fields (status, content type, charset,
  * declared length, encodings) parse best-effort even on quarantined
  * rows — they ARE the quarantine ledger's diagnosis columns — while
  * `body_text` is null unless the whole envelope verified.
  *
  * Scale shape: entirely SCAN-SIDE column algebra — one `locate`, a
  * handful of anchored `regexp_extract`s over the header block only,
  * and a `maxChunks`-bounded fold for the chunk walk; every multiply-
  * read subtree is `hof.bind`-let-bound (the q_m15 lesson). No join,
  * no shuffle, no UDF; the decompression kernels are codegen
  * expressions.
  */
object HttpMessage {

  private val CRLF2 = "\r\n\r\n"

  /** Errors in check order; `ok` ⇔ empty. */
  val ErrNoTerminator = "no-header-terminator"
  val ErrBadStatus = "bad-status-line"
  val ErrBadChunk = "bad-chunk-framing"
  val ErrLenMismatch = "length-mismatch"
  val ErrUnsupportedEnc = "unsupported-encoding"
  val ErrBadEncodedBody = "bad-encoded-body"

  private def inflateGzip(body: Column, maxBytes: Int): Column =
    org.apache.spark.sql.graft.bridge.column(GzipInflate(
      org.apache.spark.sql.graft.bridge.expression(
        encode(body, "ISO-8859-1")), maxBytes))

  private def inflateZlib(body: Column, maxBytes: Int): Column =
    org.apache.spark.sql.graft.bridge.column(ZlibInflate(
      org.apache.spark.sql.graft.bridge.expression(
        encode(body, "ISO-8859-1")), maxBytes))

  /** struct(ok, err, http_version, status_code, reason, content_type,
    * charset, content_length, chunked, content_encoding, body_text)
    * for ONE response message string (ISO-8859-1 byte view).
    */
  def parse(
      msg: Column,
      maxChunks: Int = 16,
      maxBodyBytes: Int = 1 << 24): Column = {
    require(maxChunks >= 1 && maxChunks <= 64,
      "maxChunks must be in [1, 64] (one captured response)")
    require(maxBodyBytes >= 1, "maxBodyBytes must be positive")
    graft.functions.hof.bind(coalesce(msg, lit(""))) { s =>
      graft.functions.hof.bind(
        call_function("locate", lit(CRLF2), s).cast("long")) { hEnd =>
        graft.functions.hof.bind(
          s.substr(lit(1L), greatest(hEnd - 1, lit(0L)))) { head =>
          def h(key: String): Column =
            regexp_extract(head,
              "(?i)(?:^|\r\n)" + key + ":[ \t]*([^\r\n]*)", 1)
          val statusRe = "\\AHTTP/([0-9]\\.[0-9]) ([0-9]{3})(?: ([^\r\n]*))?"
          val version = regexp_extract(head, statusRe, 1)
          val codeStr = regexp_extract(head, statusRe, 2)
          val reason = regexp_extract(head, statusRe, 3)
          val ctRaw = h("Content-Type")
          val contentType = lower(trim(regexp_extract(ctRaw, "\\A([^;]*)", 1)))
          val charset = lower(regexp_extract(ctRaw,
            "(?i)charset=[\"']?([A-Za-z0-9_.:\\-]+)", 1))
          val clStr = h("Content-Length")
          val chunked =
            lower(h("Transfer-Encoding")).contains("chunked")
          val enc = lower(trim(h("Content-Encoding")))
          graft.functions.hof.bind(
            when(clStr.rlike("\\A[0-9]{1,15}\\z"), clStr.cast("long"))) { cl =>
            graft.functions.hof.bind(
              s.substr(hEnd + lit(4L),
                greatest(length(s) - hEnd - lit(3L), lit(0L)))) { raw =>
              // ---- chunk walk: bounded fold (the Warc.walk shape) ----
              val chunkInit = struct(
                lit(1L).as("pos"), lit(false).as("done"),
                lit(true).as("cok"), lit("").as("body"))
              val dechunk = aggregate(
                sequence(lit(1), lit(maxChunks)),
                chunkInit,
                (acc, _) => {
                  val pos = acc.getField("pos")
                  val done = acc.getField("done")
                  val cok = acc.getField("cok")
                  val body = acc.getField("body")
                  graft.functions.hof.bind(
                    call_function("locate", lit("\r\n"), raw, pos)
                      .cast("long")) { e =>
                    graft.functions.hof.bind(
                      raw.substr(pos, greatest(e - pos, lit(0L)))) { szLine =>
                      val szHex = regexp_extract(szLine,
                        "\\A([0-9a-fA-F]{1,6})(?:;[^\r\n]*)?\\z", 1)
                      graft.functions.hof.bind(
                        when(szHex =!= "",
                          conv(szHex, 16, 10).cast("long"))) { sz =>
                        val lineOk = e > 0 && sz.isNotNull
                        val isLast = lineOk && sz === 0L
                        // terminal framing: optional trailer header
                        // lines then one CRLF, and the message ENDS
                        val rest = raw.substr(e + lit(2L),
                          greatest(length(raw) - e - lit(1L), lit(0L)))
                        val trailerOk =
                          rest.rlike("\\A(?:[^\r\n]+\r\n)*\r\n\\z")
                        val data = raw.substr(e + lit(2L),
                          greatest(sz, lit(0L)))
                        val dataOk = lineOk && length(data) === sz &&
                          raw.substr(e + lit(2L) + sz, lit(2L)) === "\r\n"
                        struct(
                          when(done || !cok || isLast || !dataOk, pos)
                            .otherwise(e + lit(4L) + sz).as("pos"),
                          (done || (cok && isLast && trailerOk)).as("done"),
                          (cok && (done || (lineOk &&
                            when(isLast, trailerOk).otherwise(dataOk))))
                            .as("cok"),
                          when(done || !cok || isLast || !dataOk, body)
                            .otherwise(concat(body, data)).as("body"))
                      }
                    }
                  }
                })
              graft.functions.hof.bind(dechunk) { dc =>
                val chunkOk = dc.getField("cok") && dc.getField("done")
                val framedBody =
                  when(chunked, dc.getField("body")).otherwise(raw)
                // ---- content decoding through the native kernels ----
                val encKnown = enc.isin("", "identity", "gzip", "x-gzip",
                  "deflate")
                graft.functions.hof.bind(
                  when(enc.isin("gzip", "x-gzip"),
                    decode(inflateGzip(framedBody, maxBodyBytes),
                      "ISO-8859-1"))
                    .when(enc === "deflate",
                      decode(inflateZlib(framedBody, maxBodyBytes),
                        "ISO-8859-1"))
                    .otherwise(framedBody)) { decoded =>
                  val err =
                    when(hEnd === 0, ErrNoTerminator)
                      .when(codeStr === "", ErrBadStatus)
                      .when(chunked && !chunkOk, ErrBadChunk)
                      .when(!chunked &&
                        ((clStr =!= "" && cl.isNull) ||
                          (cl.isNotNull && cl =!= length(raw))),
                        ErrLenMismatch)
                      .when(!encKnown, ErrUnsupportedEnc)
                      .when(decoded.isNull, ErrBadEncodedBody)
                      .otherwise("")
                  struct(
                    (err === "").as("ok"),
                    err.as("err"),
                    when(version =!= "", version).as("http_version"),
                    when(codeStr =!= "", codeStr.cast("int"))
                      .as("status_code"),
                    when(codeStr =!= "", reason).as("reason"),
                    contentType.as("content_type"),
                    charset.as("charset"),
                    cl.as("content_length"),
                    chunked.as("chunked"),
                    when(enc === "identity", "").otherwise(enc)
                      .as("content_encoding"),
                    when(err === "", decoded).as("body_text"))
                }
              }
            }
          }
        }
      }
    }
  }

  /** One row per message: (id, ok, err, http_version, status_code,
    * reason, content_type, charset, content_length, chunked,
    * content_encoding, n_body_bytes, body_md5, body_text) — the
    * envelope frame a crawl ingest materializes; `body_md5` is over
    * the DECODED body's true bytes (ISO-8859-1 re-encode). Quarantined
    * rows keep their header-plane diagnosis and null body columns.
    */
  def responses(
      df: DataFrame,
      idCol: String,
      msgCol: String,
      maxChunks: Int = 16,
      maxBodyBytes: Int = 1 << 24): DataFrame =
    df.select(col(idCol),
      parse(col(msgCol), maxChunks, maxBodyBytes).as("p"))
      .select(
        col(idCol),
        col("p.ok").as("ok"),
        col("p.err").as("err"),
        col("p.http_version").as("http_version"),
        col("p.status_code").as("status_code"),
        col("p.reason").as("reason"),
        col("p.content_type").as("content_type"),
        col("p.charset").as("charset"),
        col("p.content_length").as("content_length"),
        col("p.chunked").as("chunked"),
        col("p.content_encoding").as("content_encoding"),
        length(col("p.body_text")).as("n_body_bytes"),
        md5(encode(col("p.body_text"), "ISO-8859-1")).as("body_md5"),
        col("p.body_text").as("body_text"))
}
