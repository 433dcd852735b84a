package graft.core

import graft.SparkSpec

class ColumnMapSpec extends SparkSpec {

  test("parse skips blanks/comments, trims, last-wins on duplicate logical names") {
    val m = ColumnMap.parse(Iterator(
      "# comment", "", "  a = COL_A  ", "b=COL_B", "a=COL_A2", "no_equals_line"))
    assert(m.entries === Seq("a" -> "COL_A2", "b" -> "COL_B"))
  }

  test("project resolves physical names case-insensitively") {
    import spark.implicits._
    val df = Seq((1, "x"), (2, "y")).toDF("MY_KEY", "MY_VAL")
    val out = ColumnMap(Seq("key" -> "my_key", "value" -> "My_Val")).project(df)
    assert(out.columns.toSeq === Seq("key", "value"))
    assert(out.orderBy("key").collect().map(_.getString(1)).toSeq === Seq("x", "y"))
  }

  test("unmapped physical column yields null field, not an error (ref :226-235)") {
    import spark.implicits._
    val df = Seq((1, "x")).toDF("a", "b")
    val out = ColumnMap(Seq("a2" -> "a", "ghost" -> "NOT_THERE")).project(df)
    val row = out.collect().head
    assert(row.getInt(0) === 1)
    assert(row.isNullAt(1))
  }

  test("projection prunes: only mapped columns are read") {
    import spark.implicits._
    val df = Seq((1, "x", 9.9)).toDF("a", "b", "c")
    val out = ColumnMap(Seq("just_a" -> "A")).project(df)
    assert(out.columns.toSeq === Seq("just_a"))
  }
}
