package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Null-ratio column hygiene — the reference's ">90% NaN → drop the
  * column" rule (challenge.py:110-115), as a two-step operator:
  *
  *  - [[profile]]: ONE aggregation pass over the frame producing the
  *    long-form (column_name, null_frac, keep) decision table. Fully
  *    distributed; the frame is scanned once regardless of column count.
  *  - [[prune]]: applies the decision — collects the single profile row
  *    (one row on the driver is the decision itself, not a data loop) and
  *    returns `df.select(keptColumns)`. The projection then prunes the
  *    dropped columns all the way down to the scan.
  */
object NullPrune {

  /** Long-form null-fraction profile of every column of `df`. */
  def profile(df: DataFrame, threshold: Double = 0.9): DataFrame = {
    val cs = df.columns.toSeq
    val aggs = count(lit(1)).as("__n") +: cs.map(c => count(col(c)).as(s"__nn_$c"))
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cs.map(c => struct(
        lit(c).as("column_name"),
        round((col("__n") - col(s"__nn_$c")).cast("double") / col("__n"), 6)
          .as("null_frac"))): _*)).as("c"))
      .select(col("c.column_name"), col("c.null_frac"),
        (col("c.null_frac") < threshold).as("keep"))
  }

  /** Drop columns whose null fraction is >= `threshold` (challenge.py:115
    * semantics). One scan to decide, then a plain projection. */
  def prune(df: DataFrame, threshold: Double = 0.9): DataFrame = {
    val cs = df.columns.toSeq
    val aggs = count(lit(1)).as("__n") +: cs.map(c => count(col(c)).as(s"__nn_$c"))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val n = row.getLong(0).toDouble
    val keep = cs.filter(c => n == 0 ||
      (n - row.getAs[Long](s"__nn_$c")) / n < threshold)
    df.select(keep.map(col): _*)
  }
}
