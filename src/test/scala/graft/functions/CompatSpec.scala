package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CompatSpec extends SparkSpec {
  import spark.implicits._

  test("null sentinel encode/decode round-trips; decode undoes reference output") {
    val df = Seq(Some("x"), None, Some("[null]")).toDF("v")
    val enc = df.select(Compat.encodeNullSentinel(col("v")).as("e")).collect().map(_.getString(0))
    assert(enc.toSeq === Seq("x", "[null]", "[null]"))
    // decode maps the sentinel (wherever it came from) back to real NULL
    val dec = df.select(Compat.decodeNullSentinel(col("v")).as("d")).collect().map(r =>
      if (r.isNullAt(0)) null else r.getString(0))
    assert(dec.toSeq === Seq("x", null, null))
  }

  test("dbmsRandomString: right length/charset, deterministic per key, varied across keys") {
    val df = (1 to 100).map(_.toLong).toDF("k")
      .select(col("k"), Compat.dbmsRandomString(col("k"), 8).as("s"))
    val rows = df.collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.forall(_._2.length == 8))
    assert(rows.forall(_._2.forall(c => c.isLetter)))
    assert(rows.map(_._2).distinct.length > 95, "pseudonyms vary across keys")
    // deterministic: recompute equals
    val again = df.collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq === again.toSeq)
  }

  test("reference Boolean.valueOf semantics: only 'true' (any case) is true") {
    val df = Seq("true", "TRUE", "false", "[null]", "garbage", null)
      .toDF("v")
      .select(Compat.refBooleanValueOf(col("v")).as("b"))
    assert(df.collect().map(_.getBoolean(0)).toSeq ===
      Seq(true, true, false, false, false, false))
  }
}
