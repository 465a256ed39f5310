package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** W23: graph centrality over the entity-claim graph — PageRank as a
  * relational power iteration, the "which entities matter" signal the
  * reference's per-entity row store cannot compute (its README's SPARQL
  * comparison, README.md:146-152, stops at path queries; ranking the
  * ontology needs whole-graph iteration). Typical use: rank Wikidata
  * entities by claim-graph in-link structure to prioritize curation (P6)
  * or sampling weights (T19).
  *
  * Arithmetic is INTEGER units on purpose: ranks start at `scale` per node
  * and every step is `(damping * Σ floor(rank/outdeg)) div 100` — floor
  * division at each edge, so the whole iteration is exactly reproducible
  * in any engine with integer division (the DuckDB oracle unrolls the
  * same five steps in SQL and the gate hashes every rank). Doubles would
  * make the result accumulation-order-dependent across partitionings —
  * unverifiable and nondeterministic at cluster scale. Dangling nodes
  * (no out-edges) contribute nothing — their mass leaves the system, the
  * simplest deterministic convention, identical on both sides.
  *
  * Scale shape: one shuffle per iteration (the contribution `groupBy(dst)`)
  * over the EDGE set, partial-aggregated map-side; the per-edge degree is
  * joined ONCE up front and cached, not per iteration; ranks localCheckpoint
  * each round so the plan stays one-iteration deep (the ConnectedComponents
  * discipline — O(iterations) independent shuffles, not an exponentially
  * nested plan). Edges are a multiset: parallel edges weight double, the
  * same convention as the SQL replay.
  */
object Centrality {

  /** PageRank over `edges` (`src`, `dst` long columns), `iterations` steps
    * of `rank' = scale*(100-dampingPct)/100 + dampingPct * Σ_in
    * floor(rank/outdeg) div 100`. Returns (`id`, `rank`) for every node
    * appearing as a source or target. */
  def pageRank(edges: DataFrame, iterations: Int, scale: Long = 1000000L,
      dampingPct: Int = 85): DataFrame = {
    require(iterations >= 0 && dampingPct >= 0 && dampingPct <= 100)
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct().cache()
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val ed = e.join(deg, "src").cache() // (src, dst, deg) — built once
    val base = scale * (100 - dampingPct) / 100 // exact: positive longs
    var ranks = nodes.select(col("id"), lit(scale).as("rank"))
    try {
      for (_ <- 1 to iterations) {
        val contrib = ed.join(ranks, ed("src") === ranks("id"))
          .select(ed("dst").as("id"), expr("rank div deg").as("c"))
          .groupBy("id").agg(sum(col("c")).as("s"))
        ranks = nodes.join(contrib, Seq("id"), "left").select(col("id"),
            (lit(base) +
              expr(s"($dampingPct * coalesce(s, CAST(0 AS BIGINT))) div 100"))
              .as("rank"))
          .localCheckpoint(true)
      }
      ranks
    } finally { nodes.unpersist(); ed.unpersist(): Unit }
  }
}
