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
}
