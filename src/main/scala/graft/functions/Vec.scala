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

  /** Cosine similarity in double; null-safe on zero vectors. Portable
    * reference form of the native [[CosineSimilarity]] expression
    * (bit-identical; parity spec-asserted). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Random-hyperplane LSH bucket id: `bits` sign bits of projections onto
    * deterministic pseudo-random hyperplanes. Hyperplane component (j, d)
    * is derived from hash60-style md5 arithmetic so the planes are fixed
    * across runs (no RNG at plan time). */
  /** Hyperplane component sign in {-1, +1} from md5(seed:comp) parity —
    * deterministic at plan time, shared by the portable and native
    * ([[RhpBucket]]) forms. */
  def rhpSign(seed: Int, comp: Int): Double = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$seed:$comp".getBytes("UTF-8"))
    if ((digest(0) & 1) == 1) 1.0 else -1.0
  }

  def rhpBucket(v: Column, bits: Int, dim: Int, seedBase: Int = 1000): Column = {
    val bitCols = (0 until bits).map { j =>
      // Signed random projection (Achlioptas-style): the hyperplane is
      // computed once at PLAN time and embedded as a literal array, so the
      // per-row work is a single zip_with pass (dim multiply-adds per bit).
      val weights: Seq[Double] = (0 until dim).map(rhpSign(seedBase + j, _))
      val proj = aggregate(
        zip_with(v, typedLit(weights), (x, w) => x.cast("double") * w),
        lit(0.0d), (acc, p) => acc + p)
      when(proj > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }
}
