package graft

import graft.operators.Reshape

class ReshapeSpec extends SparkSpecBase {
  import spark.implicits._

  test("suffixJoin suffixes only overlapping non-key columns") {
    val l = Seq((1L, "a", 10.0)).toDF("id", "name", "value")
    val r = Seq((1L, "b", 20.0, 5L)).toDF("id", "name", "value", "extra")
    val j = Reshape.suffixJoin(l, r, "id", "_l", "_r")
    assert(j.columns.toSeq ==
      Seq("id", "name_l", "value_l", "name_r", "value_r", "extra"))
  }

  test("suffixJoin left mode keeps unmatched left rows") {
    val l = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    val r = Seq((1L, "x")).toDF("id", "name")
    assert(Reshape.suffixJoin(l, r, "id", "_l", "_r", "left").count() == 2)
  }
}
