package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Byte-compat surface for the reference's null handling: SQL NULL was
  * stringified to the literal `"[null]"` on ingest (Dao.java:64-67) and
  * leaked into downstream semantics (`Boolean.valueOf("[null]")` → false,
  * SisConnectorService.java:450). The engine keeps real SQL NULLs
  * (SURVEY.md §1.3 divergence); these expressions reproduce or undo the
  * sentinel where byte-exact output compatibility is required.
  */
object Compat {

  val NullSentinel = "[null]"

  /** NULL → "[null]" (applied on a string column at the output boundary). */
  def encodeNullSentinel(c: Column): Column =
    coalesce(c.cast("string"), lit(NullSentinel))

  /** "[null]" → NULL (applied when ingesting reference-produced data). */
  def decodeNullSentinel(c: Column): Column =
    when(c === NullSentinel, lit(null)).otherwise(c)

  /** The reference's boolean cast semantics: `Boolean.valueOf(s)` is true
    * only for case-insensitive "true" — `"[null]"`, null, and garbage all
    * become false, never an error.
    */
  def refBooleanValueOf(c: Column): Column =
    coalesce(lower(c) === "true", lit(false))
}
