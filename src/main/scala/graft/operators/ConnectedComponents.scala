package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over a pair list — the final stage of a fuzzy-dedup
  * pipeline (SURVEY.md §2.3 D6): near-dup PAIRS (from MinHash/SimHash/Jaccard)
  * chain into CLUSTERS (A~B, B~C ⇒ {A,B,C}), and each cluster keeps one
  * canonical document. Pairwise output alone over-keeps: B survives "dedup
  * against A" while C survives "dedup against B".
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14 — the same shape
  * GraphFrames/GraphX use for CC). Each round is two groupBy-join passes over
  * the edge list; the edge set contracts toward a star per component (every
  * node pointing straight at its component's minimum id) in O(log n) rounds
  * REGARDLESS of component diameter — a plain "propagate min label along
  * edges" loop needs O(diameter) rounds, which on a 100 TB near-dup graph
  * (boilerplate chains can be millions of docs long) is the difference
  * between ~40 passes and ~millions.
  *
  * Scale shape: per round, shuffles are groupBy(node) + join-back on node —
  * edge-count volume, no materialized component membership, nothing on the
  * driver but the O(1) convergence fingerprint. Rounds are localCheckpoint'd
  * (lineage truncation — see the note in `run`); `reliable = true` swaps
  * `localCheckpoint` for reliable `checkpoint` (requires
  * `sparkContext.setCheckpointDir` on the shared filesystem) — same
  * truncation semantics, durable blocks, so an executor loss mid-algorithm
  * costs a task retry instead of the whole run (local blocks die with
  * their executor and truncated lineage cannot recompute them). Local
  * stays the default for speed; spec'd equal output either way.
  */
object ConnectedComponents {

  /** (id, component) for every node appearing in `edges` — component = the
    * minimum node id reachable through the undirected pair graph. `edges`
    * must have two numeric columns (any names; first two are used);
    * self-loops are ignored.
    */
  def run(edges: DataFrame, maxRounds: Int = 40, reliable: Boolean = false): DataFrame = {
    // ONE action per round: the eager checkpoint's materialization pass
    // also computes the convergence fingerprint (count, XOR of row
    // hashes) — the separate SQL probe was a second driver round-trip per
    // round (guide §1.2: driver actions dominate iterative loops). The
    // reliable path keeps the two-action shape (durable checkpoints need
    // the FS write path).
    def checkpointFp(df: DataFrame): (DataFrame, (Long, Long)) =
      if (reliable) { val c = df.checkpoint(true); (c, fingerprint(c)) }
      else {
        val (f, n, h) =
          org.apache.spark.sql.graft.ColumnBridge.localCheckpointFingerprinted(df)
        (f, (n, h))
      }
    val Seq(ca, cb) = edges.columns.take(2).toSeq
    // Every round is localCheckpoint'd, NOT merely persisted: with persist()
    // alone each round's LOGICAL plan embeds the previous round's tree
    // several times over (largeStar/smallStar each reference `e` 2-3×), so
    // analysis/planning cost grows exponentially with the round number and
    // stalls the driver around round 10. The eager local checkpoint
    // truncates lineage to the materialized partitions — the standard move
    // for iterative DataFrame algorithms (same reason GraphFrames
    // checkpoints its CC loop).
    var (e, fp) = checkpointFp(edges
      .select(greatest(col(ca), col(cb)).as("__a"), least(col(ca), col(cb)).as("__b"))
      .filter(col("__a") =!= col("__b"))
      .distinct())
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val (next, nfp) = checkpointFp(smallStar(largeStar(e))) // materializes
      // a checkpointed round is self-contained — the previous round's blocks
      // can never be read again; release them now (owned, deterministic)
      org.apache.spark.sql.graft.ColumnBridge.unpersistCheckpoint(e)
      e = next
      converged = nfp == fp
      fp = nfp
      round += 1
    }
    // At the fixpoint the graph is a star per component: every edge is
    // (member, min-id); roots appear only on the small side. The FINAL
    // round's checkpoint blocks back the returned frame, so their owner is
    // the ContextCleaner: they are freed when the caller drops the result
    // (truncated lineage means an early explicit release would make the
    // result un-recomputable — GC ordering is exactly the safe ordering).
    e.select(col("__a").as("id"), col("__b").as("component"))
      .unionAll(e.select(col("__b").as("id"), col("__b").as("component")))
      .distinct()
  }

  /** Labels for an explicit node set: nodes absent from `edges` become
    * singleton components (component = own id). `nodes` must have one id
    * column (first column used). */
  def labels(nodes: DataFrame, edges: DataFrame, maxRounds: Int = 40,
      reliable: Boolean = false): DataFrame = {
    val idCol = nodes.columns.head
    val comp  = run(edges, maxRounds, reliable)
    nodes.select(col(idCol).as("id"))
      .join(comp, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
  }

  /** Large-star: every node u links its LARGER neighbors to m = min(N(u) ∪
    * {u}). Operates on the symmetrized adjacency; output keeps (big, small)
    * orientation because v > u ≥ m. Long chains collapse geometrically —
    * this is the pass that gives the O(log n) bound. */
  private def largeStar(e: DataFrame): DataFrame = {
    val nbrs = e.select(col("__a"), col("__b"))
      .unionAll(e.select(col("__b").as("__a"), col("__a").as("__b")))
    val m = nbrs.groupBy("__a")
      .agg(min(col("__b")).as("__mn"))
      .select(col("__a").as("__u"), least(col("__a"), col("__mn")).as("__m"))
    nbrs.join(m, col("__a") === col("__u"))
      .filter(col("__b") > col("__a"))
      .select(col("__b").as("__a"), col("__m").as("__b"))
      .distinct()
  }

  /** Small-star: every node u links its SMALLER neighbors (and itself) to
    * m = min of them — after this, u's sub-star is flattened one level. */
  private def smallStar(e: DataFrame): DataFrame = {
    // e is (big, small)-oriented already: group the small neighbors by big
    val m = e.groupBy("__a").agg(min(col("__b")).as("__m"))
    val relinked = e.join(m, Seq("__a"))
      .select(col("__b").as("__a"), col("__m").as("__b"))
      .unionAll(m.select(col("__a"), col("__m").as("__b")))
    relinked.filter(col("__a") =!= col("__b")).distinct()
  }

  /** O(1)-driver convergence check: (row count, order-independent XOR of
    * row hashes — the edge set is distinct, so XOR is collision-safe up to
    * a 2^-64 fluke, and `maxRounds` bounds the loop anyway). Used by the
    * reliable-checkpoint path only; the local path folds the equivalent
    * fingerprint into the checkpoint job itself. `sum` would trip ANSI
    * overflow. */
  private def fingerprint(e: DataFrame): (Long, Long) = {
    val row = e.agg(
      count(lit(1)).as("n"),
      coalesce(bit_xor(xxhash64(col("__a"), col("__b"))), lit(0L)).as("h")).head()
    (row.getLong(0), row.getLong(1))
  }
}
