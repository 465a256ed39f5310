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

  /** Cosine similarity; 0.0 for zero-norm vectors rather than NaN.
    * Backed by a native codegen'd expression — this sits in the inner loop
    * of every ANN/dedup candidate join. */
  def cosine(a: Column, b: Column): Column = VectorExpressions.cosineNative(a, b)

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(d(a), d(b), (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x))

  /** Scale a vector by a scalar column. */
  def scale(a: Column, k: Column): Column = transform(d(a), x => x * k)

  /** Element-wise add. */
  def add(a: Column, b: Column): Column = zip_with(d(a), d(b), (x, y) => x + y)

  /** Deterministic gaussian hyperplanes for LSH bucketing, materialized as
    * literal weight arrays at plan time: every executor gets identical planes
    * baked into the codegen'd expression, and a row costs exactly
    * `bits × dim` multiply-adds — no per-row weight derivation. `dim` must
    * match the embedding width (the planes are plan-time constants; a
    * dimension can't be data-dependent).
    * Returns an int bucket in [0, 2^bits).
    */
  def hyperplaneBucket(v: Column, bits: Int, dim: Int, seed: Int = 42): Column =
    VectorExpressions.hyperplaneBucketNative(v, bits, dim, seed)

  // ---- S4: symmetric int8 scalar quantization ----
  // The embedding-store compression step of an ANN index: 4× less memory /
  // shuffle / page-cache per vector than float32, with reconstruction error
  // bounded by scale/2 per element. All element-wise IEEE ops (cast, /, *,
  // floor, abs, max) are correctly rounded and applied in the same order on
  // any engine, so quantized codes, scales and reconstruction errors are
  // BIT-IDENTICAL cross-engine — the s4 gate hash-checks all three.

  /** Per-vector scale: amax/127 (symmetric, zero-preserving). */
  def int8Scale(v: Column): Column =
    array_max(transform(d(v), x => abs(x))) / lit(127.0)

  /** Quantize to int codes in [-127, 127]. Half-up via floor(x+0.5) — Spark
    * `round` (HALF_UP) and DuckDB `round` (half away from zero) disagree on
    * negative .5 boundaries; floor(+0.5) is one portable rule. A zero vector
    * quantizes to zeros rather than dividing by zero. */
  def quantizeInt8(v: Column, scale: Column): Column =
    when(scale === lit(0.0), transform(d(v), _ => lit(0)))
      .otherwise(transform(d(v), x => floor(x / scale + lit(0.5)).cast("int")))

  /** Reconstruct doubles from codes + scale. */
  def dequantizeInt8(q: Column, scale: Column): Column =
    transform(q, x => x.cast("double") * scale)
}
