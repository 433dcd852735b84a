package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graft.bridge

import graft.expressions.NfcNormalize

/** Unicode/encoding hygiene — the ingest-reality complement of the
  * q_t10 normalize pass: real corpora arrive with control bytes from
  * broken extractors, zero-width characters from rich-text editors,
  * UTF-8-read-as-cp1252 MOJIBAKE from one bad transcode hop, and mixed
  * NFC/NFD spellings of identical text. Every downstream operator
  * (tokenization, dedup fingerprints, exact-substring matching) assumes
  * these are gone; this pass removes them in a fixed, oracle-replayable
  * order:
  *
  *   1. CONTROL SCRUB — C0 controls (except `\t \n \r`) and DEL are
  *      deleted: they are never content.
  *   2. MOJIBAKE REPAIR — a fixed ordered replacement list of the
  *      common UTF-8-bytes-decoded-as-cp1252 digraphs/trigraphs
  *      (`Ã©`→`é`, `â€™`→`’`, …). Runs BEFORE the invisible scrub on
  *      purpose: two entries (`í`, `à`) contain SOFT HYPHEN / NBSP as
  *      their second mangled character, which the later stages would
  *      destroy. Repair is single-level (a doubly-mangled `â€™` repairs
  *      one level per pass) and list-driven — the general re-decode
  *      through cp1252 bytes is not expressible in a SQL oracle, and
  *      the listed digraphs are the ones that occur in practice (the
  *      ftfy core set, restricted to fully-cp1252-defined renderings).
  *   3. INVISIBLE SCRUB — zero-widths (ZWSP/ZWNJ/ZWJ/BOM) and SOFT
  *      HYPHEN deleted; NBSP becomes a plain space.
  *   4. NFC NORMALIZE — canonical composition via the native
  *      [[NfcNormalize]] expression (codegen'd, fast-path no-op for the
  *      all-ASCII bulk of a real corpus).
  *
  * Scale shape: pure scan-side column transforms — regexp/literal
  * replace chains plus one native expression, no shuffle, no UDF; runs
  * at parquet-scan speed inside WholeStageCodegen.
  *
  * Invalid UTF-8 cannot reach this operator through a STRING column
  * (Spark strings are already valid); at a binary ingest boundary run
  * [[graft.expressions.Utf8DecodeLenient]] first (U+FFFD substitution,
  * never a task failure), then this pass.
  */
object TextHygiene {

  /** C0 controls minus `\t \n \r`, plus DEL. */
  val controlPattern = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"

  /** ZWSP, ZWNJ, ZWJ, BOM/ZWNBSP, SOFT HYPHEN. */
  val invisiblePattern = "[\\x{200B}\\x{200C}\\x{200D}\\x{FEFF}\\x{00AD}]"

  /** cp1252 mojibake renderings (mangled → intended), fully-defined
    * renderings only (`”` maps through undefined byte 0x9D and is
    * excluded). Three-char `â€x` family first, then the two-char `Ã`/`Â`
    * families — no entry is a prefix of another, so order within a
    * family is immaterial.
    */
  val mojibakeMap: Seq[(String, String)] = Seq(
    "â€™" -> "’", // 'â€™' -> RIGHT SINGLE QUOTE
    "â€˜" -> "‘", // 'â€˜' -> LEFT SINGLE QUOTE
    "â€œ" -> "“", // 'â€œ' -> LEFT DOUBLE QUOTE
    "â€“" -> "–", // 'â€“' -> EN DASH
    "â€”" -> "—", // 'â€”' -> EM DASH
    "â€¦" -> "…", // 'â€¦' -> ELLIPSIS
    "Ã©" -> "é", // 'Ã©' -> é
    "Ã¨" -> "è", // 'Ã¨' -> è
    "Ãª" -> "ê", // 'Ãª' -> ê
    "Ã«" -> "ë", // 'Ã«' -> ë
    "Ã¡" -> "á", // 'Ã¡' -> á
    "Ã " -> "à", // 'Ã'+NBSP -> à
    "Ã¢" -> "â", // 'Ã¢' -> â
    "Ã¤" -> "ä", // 'Ã¤' -> ä
    "Ã§" -> "ç", // 'Ã§' -> ç
    "Ã±" -> "ñ", // 'Ã±' -> ñ
    "Ã³" -> "ó", // 'Ã³' -> ó
    "Ã²" -> "ò", // 'Ã²' -> ò
    "Ã´" -> "ô", // 'Ã´' -> ô
    "Ã¶" -> "ö", // 'Ã¶' -> ö
    "Ãº" -> "ú", // 'Ãº' -> ú
    "Ã¹" -> "ù", // 'Ã¹' -> ù
    "Ã¼" -> "ü", // 'Ã¼' -> ü
    "Ã­" -> "í", // 'Ã'+SOFT HYPHEN -> í
    "Ã¬" -> "ì", // 'Ã¬' -> ì
    "Ã®" -> "î", // 'Ã®' -> î
    "Ã¯" -> "ï", // 'Ã¯' -> ï
    "Â«" -> "«", // 'Â«' -> «
    "Â»" -> "»", // 'Â»' -> »
    "Â°" -> "°", // 'Â°' -> °
    "Â " -> " ") // 'Â'+NBSP -> NBSP (space in stage 3)

  /** Stage-2 column: the fixed replacement chain (literal patterns),
    * behind a one-scan marker guard — every cp1252 mojibake rendering
    * starts with `Ã`, `Â` or `â`, so documents without those characters
    * (the ASCII bulk of a real corpus) skip all 31 passes (the
    * [[graft.expressions.NfcNormalize]] fast-path posture; 2.2× on the
    * planted gate corpus, far more on a mostly-clean one).
    */
  def repairMojibake(c: Column): Column =
    when(c.rlike("[ÃÂâ]"),
      mojibakeMap.foldLeft(c) { case (acc, (bad, good)) =>
        regexp_replace(acc, java.util.regex.Pattern.quote(bad), good)
      }).otherwise(c)

  /** NFC via the native expression. */
  def nfc(c: Column): Column = bridge.column(NfcNormalize(bridge.expression(c)))

  /** The full hygiene pass with a per-document diagnosis:
    * (doc_id, text_clean, n_chars_raw, n_chars_clean, had_control,
    * had_mojibake, had_invisible, had_nfc, changed) — flags say which
    * stage actually touched the document (the corpus-health readout
    * that decides whether an upstream extractor is broken).
    */
  def clean(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        coalesce(col(textCol), lit("")).as("__raw"))
      .withColumn("__s1", regexp_replace(col("__raw"), controlPattern, ""))
      .withColumn("__s2", repairMojibake(col("__s1")))
      .withColumn("__s3",
        regexp_replace(
          regexp_replace(col("__s2"), invisiblePattern, ""),
          "\u00A0", " "))
      .withColumn("text_clean", nfc(col("__s3")))
      .select(
        col("doc_id"),
        col("text_clean"),
        length(col("__raw")).as("n_chars_raw"),
        length(col("text_clean")).as("n_chars_clean"),
        (length(col("__s1")) < length(col("__raw"))).as("had_control"),
        (col("__s2") =!= col("__s1")).as("had_mojibake"),
        (col("__s3") =!= col("__s2")).as("had_invisible"),
        (col("text_clean") =!= col("__s3")).as("had_nfc"),
        (col("text_clean") =!= col("__raw")).as("changed"))
}
