package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** S8: filtered ANN — vector search under a metadata predicate ("nearest
  * docs about X in language Y"), the production query shape every vector
  * store fields and the composition the bare S1–S7 operators leave to the
  * caller. Two regimes, chosen by the predicate's selectivity (the
  * standard pre-filter vs post-filter split):
  *
  *   - SELECTIVE predicate (few survivors): brute-scan the filtered
  *     corpus with S1's broadcast-scan + bounded-heap — EXACT, and cheap
  *     because the filter did the work; an IVF probe here would visit
  *     cells that are mostly predicate-misses and starve recall.
  *   - BROAD predicate (most rows survive): S3's IVF probe over the
  *     filtered corpus, against centroids trained on the FULL corpus —
  *     the index is built once and reused across predicates (assignment
  *     is a pure per-row function, so filtering never moves a survivor's
  *     cell). nprobe is inflated by 1/selectivity (capped at the cell
  *     count) to compensate for probed cells thinning out under the
  *     filter — the knob that keeps filtered recall at unfiltered level.
  *
  * The routing threshold is [[BruteCutoff]]: below it the filtered corpus
  * is small enough that the exact scan wins outright. Selectivity comes
  * from the caller (catalog stats / a prior count) — estimating it with
  * an extra corpus pass would cost more than it saves.
  *
  * Scale shape: identical to S1/S3 respectively — the predicate composes
  * with scan pushdown (a parquet-backed corpus filters before the
  * shuffle), and the filtered IVF path ships (cell, id, vec) only for
  * survivors.
  */
object FilteredAnn {

  /** Below this selectivity the exact pre-filtered scan is used. */
  val BruteCutoff = 0.05

  private[operators] def useBrute(selectivity: Double): Boolean =
    selectivity <= BruteCutoff

  private[operators] def inflatedNprobe(nprobe: Int, cells: Int,
      selectivity: Double): Int =
    math.min(cells, math.ceil(nprobe / math.max(selectivity, 1e-3)).toInt)

  /** Top-k under `pred`. `centroids` is the full-corpus IVF codebook
    * (ignored on the brute path); `selectivity` the caller's estimate of
    * the predicate's surviving fraction. */
  def topK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, pred: Column, k: Int,
      centroids: Seq[Array[Double]], nprobe: Int,
      selectivity: Double): DataFrame = {
    require(selectivity > 0 && selectivity <= 1.0)
    val survivors = corpus.filter(pred)
    if (useBrute(selectivity))
      Similarity.bruteForceTopK(queries, survivors, idCol, vecCol, k)
    else
      IvfAnn.topK(queries, survivors, idCol, vecCol, centroids, k,
        inflatedNprobe(nprobe, centroids.length, selectivity))
  }
}
