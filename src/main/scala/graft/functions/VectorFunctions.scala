package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float|double>` embedding columns, built entirely
  * from higher-order functions (`zip_with`/`aggregate`/`transform`) — these
  * stay inside codegen'd projection, never a UDF, so a cosine join over 100 TB
  * is pure CPU on the executors with zero serialization overhead.
  */
object VectorFunctions {

  private def d(c: Column): Column = transform(c, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0.0 for zero-norm vectors rather than NaN. */
  def cosine(a: Column, b: Column): Column = {
    val n = norm(a) * norm(b)
    when(n === 0.0, 0.0).otherwise(dot(a, b) / n)
  }

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(d(a), d(b), (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x))

  /** Scale a vector by a scalar column. */
  def scale(a: Column, k: Column): Column = transform(d(a), x => x * k)

  /** Element-wise add. */
  def add(a: Column, b: Column): Column = zip_with(d(a), d(b), (x, y) => x + y)

  /** Deterministic pseudo-random hyperplane signature for LSH bucketing:
    * bit p = sign( Σ_j w(p,j) · v_j ) with w(p,j) derived from a hash of
    * (seed, p, j) — no stored model, every executor computes identical planes.
    * Returns an int bucket in [0, 2^bits).
    */
  def hyperplaneBucket(v: Column, bits: Int, seed: Int = 42): Column = {
    val planeBits = (0 until bits).map { p =>
      // w(p,j) in [-0.5, 0.5): xxhash64 of (seed, p, j) scaled
      val weighted = zip_with(
        d(v),
        transform(sequence(lit(0), size(v) - 1), j => (pmod(xxhash64(lit(seed), lit(p), j), lit(1000000)).cast("double") / 1000000.0) - 0.5),
        (x, w) => x * w)
      val proj = aggregate(weighted, lit(0.0), (acc, x) => acc + x)
      when(proj >= 0.0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    planeBits.reduce((a, b) => a + b).cast("int")
  }
}
