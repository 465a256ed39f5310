package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** S5: product quantization of the embedding store (SURVEY §2.3) — the
  * memory-compression half of large-scale ANN (IVF-PQ): split each
  * D-dim vector into `m` subvectors, k-means each subspace independently,
  * and store each vector as `m` small codes (k ≤ 256 → one byte each). A
  * billion 768-dim float32 vectors are 3 TB raw; PQ at m=96/k=256 stores
  * them in 96 GB — the difference between an ANN index that fits executor
  * memory and one that doesn't. S4's int8 scalar quantization compresses
  * 4×; PQ compresses 32×+ and its asymmetric distances still rank well.
  *
  * Training mirrors IvfAnn's Lloyd discipline: all `m` subspaces train in
  * the SAME DataFrame passes (explode the subspace axis, group by
  * (subspace, cluster)); only the m×k×(D/m) codebook matrix reaches the
  * driver, and above `sampleCap` rows training runs on a deterministic
  * hash sample (the quantizer needs a representative sample, not the
  * population). Encoding is pure column algebra — nearest-centroid argmin
  * per subspace via higher-order functions over the broadcast codebook
  * literal, no UDF — so identical vectors always get identical codes
  * (argmin tiebreaks on the first index), which is what makes the planted
  * exact-copy gate structural.
  *
  * Determinism scope: seeding and ENCODING are fully deterministic (hash
  * order + first-index tiebreak). Lloyd's centroid update uses avg() over
  * doubles, whose accumulation order varies with partitioning — trained
  * codebooks can differ in final bits across different parallelism. Every
  * consumer here is insulated (encode is deterministic GIVEN a codebook,
  * and the s5 copy-code gate holds for any codebook); sum in a stable
  * order before relying on bit-identical training across cluster sizes.
  */
object ProductQuantizer {

  /** codebooks(j)(c) = centroid c of subspace j, length D/m each. */
  final case class Codebooks(m: Int, k: Int, subDim: Int,
      books: Seq[Seq[Array[Double]]])

  private def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), _ + _)

  /** Literal array-of-centroids for one subspace. */
  private def bookLit(book: Seq[Array[Double]]): Column =
    array(book.map(c => array(c.map(lit): _*)): _*)

  /** Train PQ codebooks: `m` subspaces × `k` centroids, Lloyd `iters`
    * rounds, all subspaces in the same cluster passes. Deterministic:
    * seeds are the first `k` subvectors per subspace in xxhash64 order.
    *
    * Assignment runs through the native [[graft.functions.PqKernel]] argmin
    * (codebooks as codegen reference objects): the earlier per-subspace
    * CASE chain over `bookLit` literals inlined m×k×subDim doubles into the
    * generated code, Janino-capping practical codebook sizes well below the
    * realistic m=8/k=256 — the same lesson as TopCentroids, PQ form. The
    * kernel's strict `<` argmin keeps the old first-index tie-break, so
    * trained codebooks and codes are unchanged. */
  def train(df: DataFrame, vecCol: String, m: Int, k: Int, iters: Int = 5,
      sampleCap: Long = 200000, knownN: Long = -1L,
      knownDim: Int = -1): Codebooks = {
    require(m > 0 && k > 0 && iters > 0, s"need m/k/iters > 0, got $m/$k/$iters")
    val all = df.select(col(vecCol).cast("array<double>").as("v"))
    // `knownDim` skips a whole-lineage head() action when the caller
    // already holds the dimensionality (IvfPq.build has it from the
    // trained coarse centroids)
    val dim = if (knownDim > 0) knownDim
      else all.select(size(col("v"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subDim = dim / m
    val n = if (knownN >= 0) knownN else all.count()
    val sampled = IvfAnn.hashSample(all, sampleCap, n)
    // persisted — seeding + every Lloyd round is an action over this frame
    val vecs = sampled
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // seeds: first k subvectors per subspace in xxhash64 order (the
      // exploded frame exists only for this one bounded-heap pass)
      val seeds = graft.plans.TopK.perGroupOrdered(
          vecs.select(explode(sequence(lit(0), lit(m - 1))).as("j"), col("v"))
            .select(col("j"),
              slice(col("v"), col("j") * subDim + 1, lit(subDim)).as("s"))
            .withColumn("__h", xxhash64(col("s"))),
          Seq("j"), Seq("__h" -> true), k)
        .select("j", "s").collect()
        .groupBy(_.getInt(0))
        .map { case (j, rows) =>
          j -> rows.map(_.getSeq[Double](1).toArray).toSeq
        }
      require(seeds.size == m && seeds.values.forall(_.nonEmpty),
        s"PQ training needs at least one vector (got seeds for ${seeds.size}/$m subspaces)")
      var books: Seq[Seq[Array[Double]]] =
        (0 until m).map(j => seeds(j).padTo(k, seeds(j).head))
      for (_ <- 0 until iters) {
        val coded = vecs.withColumn("codes",
          graft.functions.PqExpressions.pqEncodeRaw(col("v"), books))
        val updated = coded
          .select(posexplode(col("codes")).as(Seq("j", "c")), col("v"))
          .select(col("j"), col("c"),
            posexplode(slice(col("v"), col("j") * subDim + 1, lit(subDim)))
              .as(Seq("p", "x")))
          .groupBy("j", "c", "p").agg(avg(col("x")).as("mu"))
          .collect()
          .groupBy(r => (r.getInt(0), r.getInt(1)))
          .map { case ((j, c), rows) =>
            (j, c) -> rows.sortBy(_.getInt(2)).map(_.getDouble(3)).toArray
          }
        books = (0 until m).map(j =>
          (0 until k).map(c => updated.getOrElse((j, c), books(j)(c))))
      }
      Codebooks(m, k, subDim, books)
    } finally { vecs.unpersist(false): Unit }
  }

  /** Append `codesCol`: the m-element int code array for each vector
    * (native kernel — reference-object codebooks, O(1) plan size). */
  def encode(df: DataFrame, vecCol: String, cb: Codebooks,
      codesCol: String = "pq_codes"): DataFrame =
    df.withColumn(codesCol, graft.functions.PqExpressions.pqEncodeRaw(
      col(vecCol).cast("array<double>"), cb.books))

  /** Per-row squared reconstruction error ‖v − decode(codes)‖² — the
    * quantization-quality metric (spec-gated; the driver gate uses the
    * structural copy-code identity instead). */
  def reconstructionError(vecCol: String, codesCol: String,
      cb: Codebooks): Column = {
    val v = col(vecCol).cast("array<double>")
    (0 until cb.m).map { j =>
      val sub = slice(v, j * cb.subDim + 1, cb.subDim)
      val recon = element_at(bookLit(cb.books(j)),
        element_at(col(codesCol), j + 1) + 1)
      sqDist(sub, recon)
    }.reduce(_ + _)
  }
}
