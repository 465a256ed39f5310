package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** W23: integer-unit PageRank — exact equality with a driver-side
  * reference implementation, ring fixed point, dangling-mass convention,
  * parallel-edge multiset semantics, determinism across runs. */
class CentralitySpec extends SparkSpec {
  import spark.implicits._

  /** Reference power iteration with the operator's exact arithmetic. */
  private def brute(edges: Seq[(Long, Long)], iters: Int,
      scale: Long = 1000000L, d: Int = 85): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val base = scale * (100 - d) / 100
    var rank = nodes.map(_ -> scale).toMap
    for (_ <- 1 to iters) {
      val contrib = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((u, v) <- edges) contrib(v) += rank(u) / deg(u)
      rank = nodes.map(n => n -> (base + d * contrib(n) / 100)).toMap
    }
    rank
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Centrality.pageRank(edges.toDF("src", "dst"), iters)
      .as[(Long, Long)].collect().toMap

  test("exact equality with the reference on an irregular graph, dangling included (W23)") {
    // tree + cross links + an isolated sink (id 99, in-edges only, dangling)
    val edges = (2L to 60L).map(i => i -> i / 2) ++
      (1L to 60L).filter(_ % 4 == 1).map(i => i -> (i * 13 % 59 + 1)) ++
      Seq(7L -> 99L, 13L -> 99L)
    run(edges, 5) shouldBe brute(edges, 5)
  }

  test("uniform ring is a fixed point: every rank stays at scale (W23)") {
    val n = 37L
    val ring = (0L until n).map(i => i -> ((i + 1) % n))
    val ranks = run(ring, 4)
    ranks.values.toSet shouldBe Set(1000000L)
  }

  test("dangling node keeps the base rank only; its mass leaves the system (W23)") {
    // 1 -> 2, 2 has no out-edges: after one step rank(1) = base (nothing
    // points at it), rank(2) = base + 85% of rank(1)
    val ranks = run(Seq(1L -> 2L), 1)
    ranks(1L) shouldBe 150000L
    ranks(2L) shouldBe (150000L + 85L * 1000000L / 100)
    run(Seq(1L -> 2L), 3) shouldBe brute(Seq(1L -> 2L), 3)
  }

  test("parallel edges weight double (multiset semantics) (W23)") {
    // duplicating ONE of two distinct out-edges shifts the split 1/2 -> 2/3
    // (duplicating a node's only out-edge would cancel: 2 × rank/2 = rank)
    val single = Seq(1L -> 3L, 1L -> 4L, 2L -> 3L)
    val doubled = Seq(1L -> 3L, 1L -> 3L, 1L -> 4L, 2L -> 3L)
    run(doubled, 2) shouldBe brute(doubled, 2)
    run(doubled, 2) should not be run(single, 2)
  }

  test("deterministic across runs and partitionings (W23)") {
    val edges = (2L to 300L).map(i => i -> i / 2) ++
      (1L to 300L).filter(_ % 3 == 0).map(i => i -> (i * 7 % 299 + 1))
    val a = Centrality.pageRank(edges.toDF("src", "dst").repartition(13), 4)
      .as[(Long, Long)].collect().toMap
    val b = Centrality.pageRank(edges.toDF("src", "dst").repartition(2), 4)
      .as[(Long, Long)].collect().toMap
    a shouldBe b
    a shouldBe brute(edges, 4)
  }

  // ------------------------------------------------------------- W28

  /** Reference triangle count: brute-force over the canonical simple graph. */
  private def bruteTriangles(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val e = edges.collect { case (u, v) if u != v =>
      (math.min(u, v), math.max(u, v)) }.distinct.toSet
    val nodes = e.flatMap(p => Seq(p._1, p._2)).toSeq.sorted
    val counts = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      (a, i) <- nodes.zipWithIndex; b <- nodes.drop(i + 1); c <- nodes
      if c > b && e((a, b)) && e((b, c)) && e((a, c))
    } { counts(a) += 1; counts(b) += 1; counts(c) += 1 }
    counts.toMap
  }

  private def runTriangles(edges: Seq[(Long, Long)]): Map[Long, Long] =
    try Centrality.triangleCounts(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    finally Caches.releaseAll()

  test("orientation counting ≡ brute force on random graphs (W28)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 4) {
      val n = 30 + trial * 10
      val edges = Seq.fill(n * 4)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      runTriangles(edges) shouldBe bruteTriangles(edges)
    }
  }

  test("direction, duplicates and self-loops are invisible (simple-graph contract) (W28)") {
    val base = Seq(1L -> 2L, 2L -> 3L, 1L -> 3L) // one triangle
    val noisy = base ++ Seq(2L -> 1L, 3L -> 1L, 1L -> 2L, 2L -> 2L)
    runTriangles(noisy) shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L)
    runTriangles(noisy) shouldBe runTriangles(base)
  }

  test("hub skew: star graph has no triangles, wheel closes one per spoke pair (W28)") {
    val star = (1L to 50L).map(i => 0L -> i)
    runTriangles(star) shouldBe Map.empty
    // wheel = star + rim cycle: spoke i, rim edge (i, i+1) and hub close
    // a triangle per rim edge; each rim node sits in 2, the hub in 50
    val wheel = star ++ (1L to 50L).map(i => i -> (if (i == 50L) 1L else i + 1))
    val got = runTriangles(wheel)
    got(0L) shouldBe 50L
    (1L to 50L).foreach(i => got(i) shouldBe 2L)
  }

  test("triangle-free bipartite graph yields the empty frame (W28)") {
    val bip = for (a <- 0L to 9L; b <- 10L to 19L) yield a -> b
    runTriangles(bip) shouldBe Map.empty
  }
}
