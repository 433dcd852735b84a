package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.SchemaValidation._

class SchemaValidationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows = Seq(
    (1L, Some("O"), Some(100.0)),
    (2L, Some("X"), Some(100.0)),        // bad status
    (3L, None, Some(-5.0)),              // missing status + below min
    (4L, Some("F"), Some(9e9))           // above max
  ).toDF("id", "status", "amount")

  private val rules = Seq(
    FieldRule("status", required = true, allowed = Some(Seq("O", "F"))),
    FieldRule("amount", min = Some(0.0), max = Some(1e6)))

  test("validate tags each violation in rule order; clean rows are valid") {
    val v = validate(rows, rules)
      .select(col("id"), col("is_valid"), concat_ws(",", col("errors")).as("e"))
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getString(2)))).toMap
    assert(v(1L) === ((true, "")))
    assert(v(2L) === ((false, "status:not_allowed")))
    assert(v(3L) === ((false, "status:required_null,amount:below_min")))
    assert(v(4L) === ((false, "amount:above_max")))
  }

  test("split partitions the frame exactly; valid side drops the bookkeeping") {
    val (ok, bad) = SchemaValidation.split(validate(rows, rules))
    assert(ok.columns.toSeq === Seq("id", "status", "amount"))
    assert(ok.collect().map(_.getLong(0)).toSet === Set(1L))
    assert(bad.collect().map(_.getLong(0)).toSet === Set(2L, 3L, 4L))
  }

  test("range checks pass on null (nullability is required's concern)") {
    val df = Seq((1L, None: Option[Double])).toDF("id", "amount")
    val v = validate(df, Seq(FieldRule("amount", min = Some(0.0))))
    assert(v.collect().head.getAs[Boolean]("is_valid"))
  }

  test("coerce try_casts bad values to null instead of failing the scan") {
    val raw = Seq(("1", "12.5"), ("2", "not-a-number")).toDF("id", "amount")
    val c = coerce(raw, Map("id" -> "bigint", "amount" -> "double"))
    assert(c.schema("id").dataType.typeName === "long")
    assert(c.schema("amount").dataType.typeName === "double")
    val v = validate(c, Seq(FieldRule("amount", required = true)))
      .collect().map(r => r.getLong(0) -> r.getAs[Boolean]("is_valid")).toMap
    assert(v === Map(1L -> true, 2L -> false))
  }

  test("profile counts rows, nulls and distincts per column in one pass") {
    val df = Seq(
      (Some("a"), Some(1)), (Some("a"), None), (None, Some(2))
    ).toDF("s", "x")
    val p = DataProfile.profile(df, Seq("s", "x"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(p("s") === ((3L, 1L, 1L, 1.0 / 3)))
    assert(p("x") === ((3L, 1L, 2L, 1.0 / 3)))
  }
}
