package graft.operators

import graft.functions.VectorExpressions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) ANN — the centroid-bucketed scale path (SURVEY §2.3
  * S3), complementing the hyperplane-LSH variant.
  *
  * A small k-means coarse quantizer is trained with Lloyd iterations where
  * only the k×dim centroid matrix ever reaches the driver (assignment and
  * re-averaging are DataFrame aggregations over the cluster). Search assigns
  * the corpus once to its nearest centroid and probes each query's `nprobe`
  * nearest cells — candidate counts shrink by ~k/nprobe versus a full scan,
  * recall controlled by nprobe. Scoring reuses the native codegen'd cosine.
  */
object IvfAnn {

  /** Scale-invariant IVF sizing — the S3 counterpart of Similarity.lshPlan.
    * cells ~ sqrt(n) balances the per-row assignment cost (O(cells) cosine
    * evals) against per-query probe volume (O(nprobe · n/cells)); probing a
    * CONSTANT FRACTION of the cells keeps the probed corpus fraction — and
    * with it isotropic-corpus recall — constant in n, where a fixed nprobe's
    * probed fraction would vanish as cells grow (the S2 decay, IVF form).
    * IvfScaleSpec asserts the law across decades of n and measures recall
    * non-decay cross-SF. Assignment cost stays O(1) in plan size at any
    * cell count because TopCentroids carries the codebook as a reference
    * object, not literal sub-expressions. */
  final case class IvfPlan(cells: Int, nprobe: Int)
  def ivfPlan(n: Long, probeFraction: Double = 0.35,
      minCells: Int = 8, maxCells: Int = 1 << 20): IvfPlan = {
    val cells = math.min(maxCells,
      math.max(minCells, math.ceil(math.sqrt(math.max(1L, n).toDouble)).toInt))
    IvfPlan(cells, math.max(2, math.ceil(cells * probeFraction).toInt))
  }

  /** Above this cell count the flat per-row codebook scan (O(cells) cosine
    * evals) is itself the scale bottleneck and [[topK]] switches to the
    * two-level TopCentroidsHier kernel — O(sqrt(cells)) per row. The former
    * ivfPlan maxCells=4096 cap existed only to bound that flat scan; with
    * the hier path cells follow sqrt(n) to 2^20 (n ~ 10^12). */
  val FlatScanCap = 4096

  /** Cell ids of the `m` nearest centroids, (sim desc, cid asc) — one
    * native kernel call; the codebook rides along as a codegen reference
    * object so plan size and janino cost are O(1) in the cell count (the
    * literal `greatest(struct(cosine(v, lit(c)), i)…)` formulation this
    * replaces inlined k×dim doubles into the plan, capping practical k). */
  private def topCells(vec: Column, cents: Seq[Array[Double]], m: Int): Column =
    VectorExpressions.topCentroidsNative(vec, cents, m)

  /** Nearest-centroid id. */
  private def nearestCell(vec: Column, cents: Seq[Array[Double]]): Column =
    element_at(topCells(vec, cents, 1), 1)

  /** Lloyd's k-means over an embedding column. Deterministic: seeds from the
    * first `k` rows by a hash ordering; distances are cosine. Only centroids
    * (k×dim doubles) are collected — assignments never leave the executors.
    *
    * The quantizer does NOT need every row: above `sampleCap` rows training
    * runs on a deterministic hash sample of ~`sampleCap` vectors (membership
    * a pure function of the vector, the T6 rule — same sample on any
    * cluster/partitioning), so the per-iteration aggregations and the
    * persisted staging frame are O(sampleCap), not O(corpus). At 100 TB the
    * full-corpus Lloyd loop was the training-path scale-killer; centroid
    * quality needs a representative sample, not the population. `knownN`
    * supplies the corpus row count for the sampling decision (catalog stats
    * / parquet footers); when absent one count() pass determines it. */
  def trainCentroids(df: DataFrame, vecCol: String, k: Int, iters: Int = 5,
      sampleCap: Long = 200000, knownN: Long = -1L,
      flatScanCap: Int = FlatScanCap): Seq[Array[Double]] = {
    val all = df.select(col(vecCol).as("v"))
    val n = if (knownN >= 0) knownN else all.count()
    val sampled = hashSample(all, sampleCap, n)
    // persisted across Lloyd iterations: seeding + every iteration is an
    // action over this frame — unpersisted, each would re-scan the sample
    val vecs = sampled
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var cents: Seq[Array[Double]] = vecs
      .withColumn("__h", xxhash64(col("v")))
      .orderBy("__h").limit(k)
      .collect()
      .map(_.getSeq[Number](0).map(_.doubleValue()).toArray)
      .toSeq
    for (_ <- 0 until iters) {
      // above flatScanCap the Lloyd assignment itself goes two-level
      // (re-coarsened each iteration — the codebook moved): approximate
      // assignment during training is the standard big-codebook k-means
      // trade; the sampled objective tolerates it and the cost drops
      // O(sample·k) → O(sample·sqrt(k)) per iteration
      val assignCol = if (cents.length <= flatScanCap)
        nearestCell(col("v"), cents)
      else {
        val (sup, mem) = coarsen(cents)
        val sp = math.max(2, math.ceil(sup.length * 0.5).toInt)
        element_at(VectorExpressions.topCentroidsHierNative(
          col("v"), sup, mem, cents, sp, 1), 1)
      }
      val assigned = vecs.withColumn("cid", assignCol)
      val updated = assigned
        .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cid", "pos").agg(avg(col("x")).as("m"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (cid, rows) =>
          cid -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toArray
        }
      // empty cells keep their previous centroid
      cents = cents.indices.map(i => updated.getOrElse(i, cents(i)))
    }
    vecs.unpersist(false)
    cents
  }

  /** Driver-side coarse quantizer OVER the codebook: Lloyd on the centroids
    * themselves (they are already driver-resident — trainCentroids collects
    * exactly this matrix), superK ~ sqrt(cells). Deterministic: seeds are
    * evenly strided cids, cosine metric with the kernel's own (sim desc,
    * id asc) tie-break, fixed iterations. Returns (superCents, members)
    * where `members` partitions 0..cells-1 (every cell in exactly one
    * super-cell — the hier kernel's full-probe exactness depends on it). */
  def coarsen(cents: Seq[Array[Double]], superK: Int = 0,
      iters: Int = 3): (Seq[Array[Double]], Seq[Array[Int]]) = {
    val ca = cents.toArray
    val k = ca.length
    val s = math.min(k,
      if (superK > 0) superK else math.max(1, math.ceil(math.sqrt(k.toDouble)).toInt))
    // j.toLong: j * k reaches 2^40 at the 2^20 cell cap — Int would wrap
    var supers = Array.tabulate(s)(j => ca((j.toLong * k / s).toInt).clone())
    val assign = new Array[Int](k)
    for (round <- 0 to iters) {
      // the O(k·s·dim) assignment pass dominates coarsen; indices write
      // disjoint slots, so a parallel stream is safe and deterministic
      val sup = supers
      java.util.stream.IntStream.range(0, k).parallel().forEach { i =>
        assign(i) = graft.functions.TopCentroids.top(ca(i), sup, 1)(0)
      }
      // the last pass only (re)assigns against the final supers — members
      // must reflect the centroids actually shipped in the kernel
      if (round < iters) {
        val sums = Array.fill(s)(null: Array[Double])
        val counts = new Array[Int](s)
        var i = 0
        while (i < k) {
          val j = assign(i)
          if (sums(j) == null) sums(j) = new Array[Double](ca(i).length)
          val v = ca(i)
          var d = 0
          while (d < math.min(v.length, sums(j).length)) { sums(j)(d) += v(d); d += 1 }
          counts(j) += 1
          i += 1
        }
        supers = Array.tabulate(s)(j =>
          if (counts(j) == 0) supers(j)  // empty super-cells keep their centroid
          else sums(j).map(_ / counts(j)))
      }
    }
    val builders = Array.fill(s)(Vector.newBuilder[Int])
    assign.indices.foreach(i => builders(assign(i)) += i)
    val memberLists = builders.map(_.result().toArray)
    // Drop super-cells no cell assigned to (stale seed centroids): probing
    // one contributes no candidates, and a query whose ENTIRE probe set were
    // empty supers would get an empty kernel result — element_at(..., 1)
    // then errors under ANSI (or yields null cid non-ANSI, silently dropping
    // the row from the index). Empty supers carry zero information; removing
    // them keeps `members` a partition of 0..cells-1 and every probe useful.
    val kept = memberLists.indices.filter(memberLists(_).nonEmpty)
    (kept.map(supers(_)).toSeq, kept.map(memberLists(_)).toSeq)
  }

  /** Deterministic hash sample of ~`cap` of `n` rows of a vector column
    * `v`: membership a pure function of the vector itself (the T6 rule —
    * no id column needed; uniform in [0, 2^32) via xxhash64, threshold
    * sampling as `Sampling.hashUnit`). The ONE sampler shared by the IVF,
    * PQ and IVF-PQ training paths, so the seeding discipline cannot drift
    * between them. */
  private[operators] def hashSample(all: DataFrame, cap: Long, n: Long): DataFrame =
    if (n <= cap) all else {
      val u = pmod(xxhash64(col("v")), lit(4294967296L))
      all.filter(u < lit(math.round(cap.toDouble / n * 4294967296.0)))
    }

  /** Top-`m` probe-cell column under this codebook: the flat kernel below
    * `flatScanCap` cells, the two-level hier kernel above. Shared by S3
    * [[topK]] and the S6 IVF-PQ index ([[IvfPq]]) — index-build assignment
    * and search-time probe selection must agree bit-for-bit, so both sides
    * take the SAME selector. */
  private[operators] def cellSelector(centroids: Seq[Array[Double]],
      sprobe: Int = 0, superProbeFraction: Double = 0.5,
      flatScanCap: Int = FlatScanCap): (Column, Int) => Column = {
    if (centroids.length <= flatScanCap) {
      (vec, m) => topCells(vec, centroids, m)
    } else {
      val (supers, members) = coarsen(centroids)
      val sp = if (sprobe > 0) sprobe
        else math.max(2, math.ceil(supers.length * superProbeFraction).toInt)
      (vec, m) =>
        VectorExpressions.topCentroidsHierNative(vec, supers, members, centroids, sp, m)
    }
  }

  /** S3: IVF top-k — probe the `nprobe` nearest cells per query. Above
    * [[FlatScanCap]] cells both assignment and probe selection go through
    * the two-level kernel: `sprobe` super-cells are descended into
    * (default a constant fraction of them — the same constant-probed-
    * fraction law that keeps nprobe recall scale-invariant, one level up;
    * pass `sprobe >= superK` to force exact flat-equivalent assignment). */
  def topK(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[Array[Double]], k: Int = 5, nprobe: Int = 2,
      sprobe: Int = 0, superProbeFraction: Double = 0.5,
      flatScanCap: Int = FlatScanCap): DataFrame = {
    val cellsOf = cellSelector(centroids, sprobe, superProbeFraction, flatScanCap)
    val corpusAssigned = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
      .withColumn("cid", element_at(cellsOf(col("__cv"), 1), 1))
    // per query: top-nprobe cells straight from the kernel — no per-cell
    // explode, no Window (the old rank-over-explode funneled each query's
    // k cell rows through a window sort; the kernel returns the nprobe ids)
    val probeCells = broadcast(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
        .withColumn("cid", explode(cellsOf(col("__qv"), nprobe))))
    val scored = probeCells.join(corpusAssigned, Seq("cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        VectorExpressions.cosineNative(col("__qv"), col("__cv")).as("cosine"))
    // bounded-heap finish (map-side partial top-k, then one slim shuffle) —
    // the window formulation sent every candidate of a query to one partition
    Similarity.topKFinish(scored, k)
  }

  /** S14: distributed k-NN JOIN — top-k right-side neighbors for EVERY
    * left row when BOTH sides are cluster-scale. S1 broadcasts the query
    * side and S3 broadcasts the probe list: both assume a driver-bounded
    * query set. A corpus-vs-corpus join (retrieval evaluation, semantic
    * linking, nearest-neighbor graphs for clustering) has none — at 1e9 ×
    * 1e9 the only viable shape is co-partitioning both sides by a shared
    * coarse quantizer: train cells on the RIGHT corpus (sample-capped
    * Lloyd), assign each right row to its home cell and each left row to
    * its `nprobe` nearest cells (multi-probe, the recall lever), SHUFFLE-
    * join on cell id, score with the native cosine kernel, bounded-heap
    * top-k per left row.
    *
    * No cross join ever exists and nothing driver-sized is assumed:
    * shuffle volume is |right| + nprobe·|left| (id, vector) rows; per-cell
    * work is left-in-cell × right-in-cell, bounded by the sqrt(n) cell
    * law; the heap finish ships k rows per left id. With `nprobe` = cells
    * the result is exactly the brute-force join (spec-asserted) — recall
    * tuning is the same constant-probed-fraction story as S3, one join
    * wider. `excludeSelf` drops id-equal pairs for self-join uses (a
    * k-NN graph over one corpus). */
  def knnJoin(left: DataFrame, right: DataFrame, leftId: String,
      rightId: String, vecCol: String, k: Int = 5, cells: Int = 0,
      nprobe: Int = 0, excludeSelf: Boolean = false,
      knownN: Long = -1L): DataFrame = {
    val n = if (knownN >= 0) knownN else right.count()
    val plan = ivfPlan(n)
    val c = if (cells > 0) cells else plan.cells
    val np = math.min(if (nprobe > 0) nprobe else plan.nprobe, c)
    val cents = trainCentroids(right, vecCol, c, knownN = n)
    val cellsOf = cellSelector(cents)
    val r = right.select(col(rightId).as("neighbor_id"), col(vecCol).as("__cv"))
      .withColumn("cid", element_at(cellsOf(col("__cv"), 1), 1))
    val l = left.select(col(leftId).as("query_id"), col(vecCol).as("__qv"))
      .withColumn("cid", explode(cellsOf(col("__qv"), np)))
    val joined = l.join(r, Seq("cid"))
    val paired = if (excludeSelf)
      joined.filter(col("query_id") =!= col("neighbor_id")) else joined
    Similarity.topKFinish(paired.select(col("query_id"), col("neighbor_id"),
      VectorExpressions.cosineNative(col("__qv"), col("__cv")).as("cosine")), k)
  }

  /** S17: the [[knnJoin]] under SIGN QUANTIZATION (S14 × S15) — the
    * corpus-vs-corpus join where the dominant cost is the cell shuffle's
    * WIRE VOLUME: here the right side ships (id, cell, packed sign words)
    * — one bit per dimension, 32× under float32 — the in-cell scan scores
    * the float query against the words with the native asymmetric
    * [[graft.functions.SignDot]], a per-query `shortlist` survives, and
    * exact cosine over the full float vectors decides the final k.
    * Quantization error can only cost recall at the shortlist boundary,
    * never mis-rank the shortlisted (the S7/S15 re-rank law).
    *
    * The re-rank joins the shortlist ids back to BOTH float sides as
    * shuffled hash joins — neither side broadcasts, both corpora are
    * cluster-scale by contract — priced at shortlist·|left| rows, not the
    * cell fan-out. With `shortlist` covering every in-cell candidate the
    * result is exactly [[knnJoin]] at the same geometry, and with
    * `nprobe = cells` too it is exactly the brute-force join
    * (spec-asserted). Zero vectors follow [[knnJoin]]'s semantics. */
  def knnJoinQuantized(left: DataFrame, right: DataFrame, leftId: String,
      rightId: String, vecCol: String, k: Int = 5, cells: Int = 0,
      nprobe: Int = 0, shortlist: Int = 32, excludeSelf: Boolean = false,
      knownN: Long = -1L): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must be >= k $k")
    val n = if (knownN >= 0) knownN else right.count()
    val plan = ivfPlan(n)
    val c = if (cells > 0) cells else plan.cells
    val np = math.min(if (nprobe > 0) nprobe else plan.nprobe, c)
    val cents = trainCentroids(right, vecCol, c, knownN = n)
    val cellsOf = cellSelector(cents)
    val r = right.select(col(rightId).as("neighbor_id"),
      graft.functions.VectorExpressions.signPackNative(col(vecCol)).as("__w"),
      element_at(cellsOf(col(vecCol), 1), 1).as("cid"))
    val l = left.select(col(leftId).as("query_id"), col(vecCol).as("__qv"))
      .withColumn("cid", explode(cellsOf(col("__qv"), np)))
    val joined = l.join(r, Seq("cid"))
    val paired = if (excludeSelf)
      joined.filter(col("query_id") =!= col("neighbor_id")) else joined
    val scored = paired.select(col("query_id"), col("neighbor_id"),
      graft.functions.VectorExpressions.signDotNative(col("__qv"), col("__w")).as("__a"))
    val short = graft.plans.TopK.perGroupOrdered(scored, Seq("query_id"),
        Seq("__a" -> false, "neighbor_id" -> true), shortlist)
      .select("query_id", "neighbor_id")
    val exact = short
      .join(right.select(col(rightId).as("neighbor_id"), col(vecCol).as("__cv")),
        "neighbor_id")
      .join(left.select(col(leftId).as("query_id"), col(vecCol).as("__qv")),
        "query_id")
      .select(col("query_id"), col("neighbor_id"),
        VectorExpressions.cosineNative(col("__qv"), col("__cv")).as("cosine"))
    Similarity.topKFinish(exact, k)
  }
}
