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

  /** `DBMS_RANDOM.STRING('a', n)` compat (the anonymization scalar in the
    * shipped SQL, teacherCandidate.sql:3-5): n random mixed-case letters.
    *
    * Two modes, because "random" is a fork in a distributed engine:
    *   - seeded (default): deterministic per input key — same key, same
    *     pseudonym across runs AND across task retries (referentially
    *     transparent anonymization, what a retried Spark task needs);
    *   - `seedCol = None`-style true randomness is deliberately absent:
    *     rand()-derived strings change under retry and break upsert
    *     convergence. The reference only avoids this by being
    *     single-threaded.
    */
  def dbmsRandomString(seedCol: Column, n: Int): Column =
    concat((0 until n).map { i =>
      val h = pmod(xxhash64(seedCol, lit(i)), lit(52L))
      // 0-25 → a-z, 26-51 → A-Z
      when(h < 26, chr(h + 97)).otherwise(chr(h - 26 + 65))
    }: _*)
}
