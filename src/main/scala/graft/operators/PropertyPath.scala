package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Transitive property-path closure — the `wdt:P279+` reachability core of
  * the `wdt:P279*` / `wdt:P31/wdt:P279*` query shape (reference
  * README.md:129-156 does single-step conjunctive claims; SPARQL's paths
  * are the natural next ask of the same entity table). NOTE: `closure`
  * returns pairs at >= 1 hops (`+` semantics); SPARQL `*` additionally
  * includes the zero-hop (x, x) pairs — `QueryApi.pathClosure`, which
  * wires this to the wd2sql surface, adds them by default.
  *
  * Algorithm: path doubling. Round k holds every (src, dst) pair within
  * 2^k hops, so the fixpoint lands in O(log diameter) rounds — a frontier
  * BFS is O(diameter) rounds, and on a 100-deep ontology chain driver
  * round-trips, not shuffle volume, dominate (the D6 lesson; CC uses the
  * same round discipline and lineage truncation). The doubling join is
  * self-join-on-dst=src — edge-volume shuffles keyed on node ids.
  *
  * Scale note: this materializes the FULL closure of the property subgraph
  * it is given. That is the right unit for ontology-shaped properties
  * (P279/P31 span millions of classes, not the 100 TB claim set — filter
  * the entity table to the property FIRST, as `QueryApi.pathClosure` does).
  * For one-off single-root questions over huge diameters a frontier loop
  * ships fewer total bytes; the closure is the reusable artifact (every
  * "instance of, transitively" filter downstream is then one semi-join).
  *
  * `reliable = true` swaps `localCheckpoint` for reliable `checkpoint`
  * (requires `sparkContext.setCheckpointDir`) — executor-loss-safe rounds
  * at the cost of writing each round to the checkpoint filesystem; same
  * trade as [[ConnectedComponents.run]].
  */
object PropertyPath {

  /** The closure plus the round count it took (spec hook: the O(log d)
    * bound is asserted, not assumed). */
  final case class Closure(pairs: DataFrame, rounds: Int)

  /** Full reachability closure of a (child, parent) edge list: every
    * (src, dst) with dst reachable from src in >= 1 hops. First two columns
    * of `edges` are used; self-loops dropped. */
  def closureWithStats(edges: DataFrame, maxRounds: Int = 20,
      reliable: Boolean = false): Closure = {
    val Seq(ca, cb) = edges.columns.take(2).toSeq
    def checkpoint(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint(true) else df.localCheckpoint(true)
    var r = checkpoint(
      edges.select(col(ca).cast("long").as("src"), col(cb).cast("long").as("dst"))
        .filter(col("src") =!= col("dst") && col("dst").isNotNull)
        .distinct())
    var n = r.count()
    var rounds = 0
    var done = false
    while (!done && rounds < maxRounds) {
      // pairs within 2^(k+1) hops = pairs within 2^k ∪ (2^k ∘ 2^k)
      val doubled = r.as("x")
        .join(r.as("y"), col("x.dst") === col("y.src"))
        .select(col("x.src").as("src"), col("y.dst").as("dst"))
      val next = checkpoint(r.unionByName(doubled).distinct())
      val nn = next.count()
      done = nn == n
      // a checkpointed round is self-contained; the superseded round's
      // blocks can never be read again (same ownership rule as CC)
      org.apache.spark.sql.graft.ColumnBridge.unpersistCheckpoint(r)
      r = next
      n = nn
      rounds += 1
    }
    Closure(r, rounds)
  }

  /** Closure pairs only — the common call. */
  def closure(edges: DataFrame, maxRounds: Int = 20,
      reliable: Boolean = false): DataFrame =
    closureWithStats(edges, maxRounds, reliable).pairs

  /** W27: minimum HOP DISTANCES from a source set along (src, dst) edges —
    * the "how far up the ontology is this class" / "degrees of separation"
    * question the boolean closure cannot answer. Frontier BFS with a
    * min-dist visited set: round k settles every node at distance k, so
    * the loop runs O(radius) rounds shipping (node, dist) ids only — the
    * right trade for distance queries (path doubling would need min-plus
    * joins carrying a dist column through every doubling, more shuffle
    * volume for the same answer; closure stays the doubling's job).
    * Each round is checkpointed and the superseded one released (the CC
    * ownership rule). Unreachable nodes are absent from the result.
    * Throws if `maxRounds` rounds leave an unsettled frontier. */
  def hopDistances(edges: DataFrame, sources: DataFrame, maxRounds: Int = 64,
      reliable: Boolean = false): DataFrame = {
    val Seq(ca, cb) = edges.columns.take(2).toSeq
    def checkpoint(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint(true) else df.localCheckpoint(true)
    val e = checkpoint(
      edges.select(col(ca).cast("long").as("src"), col(cb).cast("long").as("dst"))
        .filter(col("dst").isNotNull).distinct())
    val srcCol = sources.columns.head
    var settled = checkpoint(sources
      .select(col(srcCol).cast("long").as("id")).distinct()
      .withColumn("dist", lit(0L)))
    var frontier = settled
    var round = 0
    var frontierN = frontier.count()
    while (frontierN > 0) {
      require(round < maxRounds,
        s"hopDistances did not settle within $maxRounds rounds")
      round += 1
      val next = checkpoint(frontier.join(e, col("id") === col("src"))
        .select(col("dst").as("id"))
        .distinct()
        .join(settled.select("id"), Seq("id"), "left_anti")
        .withColumn("dist", lit(round.toLong)))
      val nextSettled = checkpoint(settled.unionByName(next))
      org.apache.spark.sql.graft.ColumnBridge.unpersistCheckpoint(settled)
      if (round > 1) // round 1's frontier IS the initial settled frame
        org.apache.spark.sql.graft.ColumnBridge.unpersistCheckpoint(frontier)
      settled = nextSettled
      frontier = next
      frontierN = next.count()
    }
    settled
  }
}
