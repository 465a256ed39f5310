package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorExpressions

/** D10: semantic deduplication — the SemDeDup shape (Abbas et al. 2023,
  * arXiv:2303.09540): k-means-cluster the embedding space, then remove
  * near-identical vectors WITHIN each cluster, keeping one representative
  * per near-dup group. The cluster is the blocking key, so the pairwise
  * cosine work is per-cell instead of corpus-quadratic — the published
  * algorithm's own trade: near-dup pairs that straddle a cell boundary
  * are not examined (for exact copies this never triggers — identical
  * vectors share a cell by construction, since the deterministic
  * assignment is a pure function of the vector).
  *
  * Composition, not new machinery: S3's deterministic Lloyd training +
  * cell assignment (bit-identical selector, two-level past FlatScanCap),
  * within-cell pairs at `threshold` via the native cosine kernel, D6's
  * large-star/small-star components over those pairs (a transitive
  * near-dup CHAIN collapses to ONE doc — pairwise-only dedup over-keeps,
  * the d6 rationale), keep = component minimum. Deterministic end to
  * end: training samples/seeds are hash-ordered, assignment and cosine
  * are pure functions, component minima are unique — so the survivor set
  * is a pure function of the corpus, independent of partitioning.
  *
  * Scale shape: training collects only k×dim doubles (sample-capped);
  * the pair join ships (cid, id, vec) clustered by cell — cell sizes are
  * ~n/cells so per-cell pairwise is bounded, and the id-only edges feed
  * the O(log n) CC rounds. The survivor anti-join is a broadcast-friendly
  * semi-join on ids.
  */
object SemanticDedup {

  /** Survivors of cluster-scoped near-dup removal: (`id`, `cid`,
    * `component`) for each KEPT row — the component minimum of every
    * within-cell near-dup group at `cosine ≥ threshold`, plus every row
    * in no group. */
  def dedup(vecs: DataFrame, idCol: String, vecCol: String,
      threshold: Double, cells: Int, iters: Int = 3, knownN: Long = -1L)
      : DataFrame = {
    require(threshold > 0 && threshold <= 1.0 && cells >= 1)
    val cents = IvfAnn.trainCentroids(vecs, vecCol, cells, iters, knownN = knownN)
    val sel = IvfAnn.cellSelector(cents)
    // Caches-owned: the assigned frame feeds both join sides, the CC node
    // list and the final keep-join — unowned, Spark re-runs the full cell
    // assignment per consumer (the scoreComponents lesson; review-caught)
    val assigned = Caches.owned(vecs
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .withColumn("cid", element_at(sel(col("v"), 1), 1)))
    val a = assigned.select(col("cid"), col("id").as("src"), col("v").as("va"))
    val b = assigned.select(col("cid"), col("id").as("dst"), col("v").as("vb"))
    val pairs = a.join(b, "cid")
      .filter(col("src") < col("dst") &&
        VectorExpressions.cosineNative(col("va"), col("vb")) >= threshold)
      .select("src", "dst")
    val labels = ConnectedComponents.labels(assigned.select(col("id")), pairs)
    assigned.join(labels, "id")
      .filter(col("id") === col("component"))
      .select(col("id"), col("cid"), col("component"))
  }
}
