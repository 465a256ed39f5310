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

  /** W28: per-node triangle counts — the local clustering signal ("how
    * interlinked is this entity's neighborhood") that flags template/
    * boilerplate cliques in a claim graph the way D4 flags them in text.
    * Direction, multiplicity and self-loops are graph noise, not signal:
    * edges canonicalize to the undirected simple graph first, so parallel
    * and reverse edges count once.
    *
    * The scalable shape is DEGREE-ORDERED ORIENTATION (the node-iterator
    * bound): orient every undirected edge from its (deg, id)-smaller
    * endpoint to its larger one — a total order, so each triangle survives
    * as exactly ONE wedge (two out-edges of its smallest-rank apex) plus
    * its closing oriented edge. Out-degree under this orientation is
    * O(sqrt(m)) whatever the degree skew (a hub's edges mostly point AT
    * it), so the wedge self-join — the only quadratic-risk step — is
    * per-node bounded: a 1e8-follower account in a social graph generates
    * no wedge explosion because its apex role is capped by rank, not raw
    * degree. Three shuffles total (degree agg, wedge join on apex, closing
    * join on the (v, w) pair), all partial-aggregated or key-local; no
    * driver state.
    */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val und = edges.select(
        least(col("src").cast("long"), col("dst").cast("long")).as("a"),
        greatest(col("src").cast("long"), col("dst").cast("long")).as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .distinct()
    val deg = und.select(col("a").as("id"))
      .unionAll(und.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    val da = deg.select(col("id").as("a"), col("deg").as("__da"))
    val db = deg.select(col("id").as("b"), col("deg").as("__db"))
    // (deg, id) lexicographic rank — ties broken by id, so the order is
    // total and the orientation acyclic
    val aFirst = struct(col("__da"), col("a")) < struct(col("__db"), col("b"))
    // three consumers (both wedge legs and the closing probe) read the
    // oriented set — persist once, released by the caller via Caches
    val oriented = Caches.owned(und.join(da, "a").join(db, "b").select(
      when(aFirst, col("a")).otherwise(col("b")).as("lo"),
      when(aFirst, col("b")).otherwise(col("a")).as("hi"),
      when(aFirst, col("__db")).otherwise(col("__da")).as("__dhi")))
    val e1 = oriented.select(col("lo"), col("hi").as("v"), col("__dhi").as("__dv"))
    val e2 = oriented.select(col("lo"), col("hi").as("w"), col("__dhi").as("__dw"))
    // wedge (v, w) ordered by rank ⇒ the closing edge, if present, is
    // oriented exactly v → w — one equi-join probe, no disjunction
    val wedges = e1.join(e2, "lo")
      .filter(struct(col("__dv"), col("v")) < struct(col("__dw"), col("w")))
      .select(col("lo").as("apex"), col("v"), col("w"))
    val tris = wedges.join(
      oriented.select(col("lo").as("v"), col("hi").as("w")), Seq("v", "w"))
    tris.select(explode(array(col("apex"), col("v"), col("w"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("triangles"))
  }
}
