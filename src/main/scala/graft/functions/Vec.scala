package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, as pure Column
  * expressions (codegen'd, no UDF, no row explosion). Sums run in index
  * order per row, so results are deterministic across partitionings.
  */
object Vec {

  /** Dot product of two equal-length float arrays, in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d), (acc, v) => acc + v)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double; null-safe on zero vectors. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine rounded for cross-engine-stable comparisons/ordering. */
  def cosineRounded(a: Column, b: Column, scale: Int = 6): Column =
    round(cosine(a, b), scale)

  /** Random-hyperplane LSH bucket id: `bits` sign bits of projections onto
    * deterministic pseudo-random hyperplanes. Hyperplane component (j, d)
    * is derived from hash60-style md5 arithmetic so the planes are fixed
    * across runs (no RNG at plan time). */
  def rhpBucket(v: Column, bits: Int, dim: Int): Column = {
    val bitCols = (0 until bits).map { j =>
      // component weights in {-1, +1} from md5(j:d) parity — a signed
      // random projection (Achlioptas-style) that codegen handles well.
      val proj = aggregate(
        zip_with(v, sequence(lit(0), lit(dim - 1)), (x, d) =>
          x.cast("double") * when(
            Text.hash60(d.cast("string"), 1000 + j).bitwiseAND(1L) === 1L,
            lit(1.0d)).otherwise(lit(-1.0d))),
        lit(0.0d), (acc, p) => acc + p)
      when(proj > 0, lit(1L) * (1L << j)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }
}
