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

  test("reference Boolean.valueOf semantics: only 'true' (any case) is true") {
    val df = Seq("true", "TRUE", "false", "[null]", "garbage", null)
      .toDF("v")
      .select(Compat.refBooleanValueOf(col("v")).as("b"))
    assert(df.collect().map(_.getBoolean(0)).toSeq ===
      Seq(true, true, false, false, false, false))
  }
}
