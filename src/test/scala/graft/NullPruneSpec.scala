package graft

import org.apache.spark.sql.functions._
import graft.operators.NullPrune

class NullPruneSpec extends SparkSpecBase {
  import spark.implicits._

  test("prune drops columns at/above the null threshold, keeps the rest") {
    val df = (1 to 100).toDF("id")
      .withColumn("mostly_null", when(col("id") <= 5, col("id")))
      .withColumn("half_null", when(col("id") <= 50, col("id")))
    val kept = NullPrune.prune(df, 0.9).columns.toSeq
    assert(kept == Seq("id", "half_null"))
  }

  test("profile emits one row per column with correct fractions") {
    val df = (1 to 10).toDF("id")
      .withColumn("n9", when(col("id") === 1, col("id")))
    val rows = NullPrune.profile(df).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    assert(rows("id") == ((0.0, true)))
    assert(rows("n9") == ((0.9, false)))
  }
}
