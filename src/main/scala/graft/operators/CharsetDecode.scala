package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.Utf8DecodeLenient

/** Charset SNIFF + DECODE to Unicode — the step between the HTTP
  * envelope ([[HttpMessage]]) and every text operator: crawled bytes
  * arrive in whatever encoding the origin served, and a corpus
  * pipeline must pick the charset the way a browser does before any
  * tokenizer may touch the text. The reference receives pre-decoded
  * JSON strings and never faces raw bytes; this is extension surface
  * for the 100 TB crawl path.
  *
  * Input is the STRING byte-view (ISO-8859-1, the lossless byte↔char
  * bijection the container walks emit) — offsets are byte-exact and
  * the decode arms re-encode to the original bytes.
  *
  * SNIFF precedence (the WHATWG encoding-detection order, bounded):
  *   1. BOM — `EF BB BF` → utf-8, `FF FE` → utf-16le, `FE FF` →
  *      utf-16be (a BOM outranks every declaration);
  *   2. the transport declaration — the Content-Type `charset`
  *      parameter the envelope parsed;
  *   3. an in-document `<meta charset=…>` / http-equiv declaration
  *      scanned in the first `sniffWindow` bytes only (the browser
  *      prescan — NEVER the whole document);
  *   4. default iso-8859-1 (the HTTP/1.1 legacy default).
  * Declared names normalize through an alias table (utf8, cp1252,
  * latin1, …) so the decode arms see canonical charsets.
  *
  * DECODE arms — each scan-side, no UDF:
  *   - `utf-8` through the native [[graft.expressions.Utf8DecodeLenient]]
  *     kernel (U+FFFD substitution, never a fault — crawl bytes lie);
  *     a leading BOM is stripped;
  *   - `iso-8859-1` / `ascii`: the byte-view IS the decoded text
  *     (Latin-1 code points are the first 256 of Unicode; ascii rides
  *     its superset);
  *   - `windows-1252`: table-driven — cp1252 differs from Latin-1 only
  *     on the 0x80–0x9F range, so one `translate()` call maps the 27
  *     defined bytes and sends the five undefined ones to U+FFFD,
  *     byte-for-byte what `java.nio`'s Cp1252 decoder does under
  *     REPLACE (spec-pinned parity);
  *   - utf-16 variants are DETECTED but not decoded (`decodable` =
  *     false, text null): a surrogate-correct UTF-16 arm is out of
  *     scope this round and quarantining honestly beats mangling.
  */
object CharsetDecode {

  private val Bom8 = "\u00EF\u00BB\u00BF"
  private val Bom16LE = "\u00FF\u00FE"
  private val Bom16BE = "\u00FE\u00FF"

  /** cp1252 0x80–0x9F (as Latin-1 view chars) → Unicode targets,
    * index-aligned for `translate`; the five undefined bytes
    * (81 8D 8F 90 9D) map to U+FFFD, byte-for-byte what java.nio's
    * Cp1252 decoder yields under REPLACE.
    */
  private val Cp1252From: String =
    "\u0080\u0081\u0082\u0083\u0084\u0085\u0086\u0087\u0088\u0089" +
      "\u008A\u008B\u008C\u008D\u008E\u008F\u0090\u0091\u0092\u0093" +
      "\u0094\u0095\u0096\u0097\u0098\u0099\u009A\u009B\u009C\u009D" +
      "\u009E\u009F"
  private val Cp1252To: String =
    "\u20AC\uFFFD\u201A\u0192\u201E\u2026\u2020\u2021\u02C6\u2030" +
      "\u0160\u2039\u0152\uFFFD\u017D\uFFFD\uFFFD\u2018\u2019\u201C" +
      "\u201D\u2022\u2013\u2014\u02DC\u2122\u0161\u203A\u0153\uFFFD" +
      "\u017E\u0178"

  /** Canonicalize a declared charset name (lowercase + alias table);
    * unknown names pass through and fail `decodable` downstream.
    */
  def normalizeName(cs: Column): Column = {
    val c = lower(trim(cs))
    when(c.isin("utf8", "utf-8"), "utf-8")
      .when(c.isin("windows-1252", "cp1252", "cp-1252", "win-1252",
        "x-cp1252"), "windows-1252")
      .when(c.isin("iso-8859-1", "iso8859-1", "iso_8859-1", "latin-1",
        "latin1", "l1", "8859-1"), "iso-8859-1")
      .when(c.isin("us-ascii", "ascii"), "ascii")
      .when(c.isin("utf-16le", "utf16le"), "utf-16le")
      .when(c.isin("utf-16be", "utf16be"), "utf-16be")
      .when(c.isin("utf-16", "utf16"), "utf-16")
      .otherwise(c)
  }

  /** struct(charset, source) — source ∈ {bom, header, meta, default}. */
  def sniff(
      raw: Column,
      headerCharset: Column,
      sniffWindow: Int = 1024): Column = {
    require(sniffWindow >= 16, "sniffWindow must be at least 16 bytes")
    graft.functions.hof.bind(coalesce(raw, lit(""))) { s =>
      val bom = when(s.startsWith(Bom8), "utf-8")
        .when(s.startsWith(Bom16LE), "utf-16le")
        .when(s.startsWith(Bom16BE), "utf-16be")
      val hdr = normalizeName(coalesce(headerCharset, lit("")))
      val meta = normalizeName(regexp_extract(
        s.substr(lit(1), lit(sniffWindow)),
        "(?i)<meta[^>]{0,200}?charset\\s*=\\s*[\"']?([A-Za-z0-9_.:\\-]+)",
        1))
      struct(
        coalesce(bom,
          when(hdr =!= "", hdr),
          when(meta =!= "", meta),
          lit("iso-8859-1")).as("charset"),
        when(bom.isNotNull, "bom")
          .when(hdr =!= "", "header")
          .when(meta =!= "", "meta")
          .otherwise("default").as("source"))
    }
  }

  /** Decode the byte-view under a CANONICAL charset name; null when
    * the charset has no decode arm (utf-16*, unknown declarations).
    */
  def decodeTo(raw: Column, charset: Column): Column =
    graft.functions.hof.bind(coalesce(raw, lit(""))) { s =>
      // BOM stripping belongs to the UTF-8 arm ONLY: under latin-1/
      // cp1252 the bytes EF BB BF are legitimate text (ï»¿)
      val noBom = when(s.startsWith(Bom8), s.substr(lit(4), length(s)))
        .otherwise(s)
      when(charset === "utf-8",
        org.apache.spark.sql.graft.bridge.column(Utf8DecodeLenient(
          org.apache.spark.sql.graft.bridge.expression(
            encode(noBom, "ISO-8859-1")))))
        .when(charset.isin("iso-8859-1", "ascii"), s)
        .when(charset === "windows-1252",
          translate(s, Cp1252From, Cp1252To))
    }

  /** One row per document: (id, charset, charset_source, decodable,
    * n_chars, text) — the decoded-Unicode frame the text pipeline
    * consumes. `headerCharsetCol` is the envelope's parsed charset
    * param (empty/null = no transport declaration).
    */
  def decodeAll(
      df: DataFrame,
      idCol: String,
      rawCol: String,
      headerCharsetCol: Option[String] = None,
      sniffWindow: Int = 1024): DataFrame = {
    val hdr = headerCharsetCol.map(col).getOrElse(lit(""))
    df.select(col(idCol),
      sniff(col(rawCol), hdr, sniffWindow).as("__sn"),
      col(rawCol).as("__raw"))
      .select(col(idCol),
        col("__sn.charset").as("charset"),
        col("__sn.source").as("charset_source"),
        decodeTo(col("__raw"), col("__sn.charset")).as("text"))
      .select(col(idCol), col("charset"), col("charset_source"),
        col("text").isNotNull.as("decodable"),
        length(col("text")).as("n_chars"),
        col("text"))
  }
}
