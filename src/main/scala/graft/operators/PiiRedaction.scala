package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection + redaction over text columns — the scrubbing pass a
  * training-data pipeline runs before anything else sees the corpus
  * (emails, SSN-shaped ids, phone-shaped numbers, IPv4 literals
  * replaced by typed placeholder tokens, with per-document match
  * counts kept for the audit trail).
  *
  * Patterns run as a SEQUENTIAL fold in a fixed order (emails → SSNs →
  * phones → IPs): each pattern counts against the CURRENT text and
  * then rewrites it, so an SSN consumed by its own placeholder can
  * never double-count as a phone number — the same discipline a
  * production scrubber applies. Patterns deliberately stay within the
  * regex subset Java's engine and RE2 agree on (character classes,
  * bounded quantifiers, `\b`, `\d`) so the oracle replays every count
  * and every rewrite byte-for-byte; the gate compares an md5 of the
  * fully-redacted text.
  *
  * Shape: pure scan-side codegen string ops — no shuffle, no UDF, no
  * state; at 100 TB this is a map-only pass that fuses into whatever
  * scan feeds it.
  */
object PiiRedaction {

  /** (counter column, regex, replacement), applied in order. */
  val patterns: Seq[(String, String, String)] = Seq(
    ("n_emails", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
    ("n_ssns", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "[SSN]"),
    ("n_phones", "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b", "[PHONE]"),
    ("n_ips", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "[IP]"))

  /** Per-doc redaction report: (idCol, n_emails, n_ssns, n_phones,
    * n_ips, redacted). NULL text redacts to the empty string.
    */
  def redact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val init = df.select(col(idCol),
      coalesce(col(textCol), lit("")).as("__cur"))
    val folded = patterns.foldLeft(init) { case (d, (name, pat, repl)) =>
      d.withColumn(name, size(regexp_extract_all(col("__cur"), lit(pat), lit(0))))
        .withColumn("__cur", regexp_replace(col("__cur"), pat, repl))
    }
    val cols: Seq[Column] =
      col(idCol) +: patterns.map(p => col(p._1)) :+ col("__cur").as("redacted")
    folded.select(cols: _*)
  }
}
