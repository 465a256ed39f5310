package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** W20 path-doubling closure + the reliable-checkpoint flag it shares with
  * D6's connected components. */
class PropertyPathSpec extends SparkSpec {
  import spark.implicits._

  // random DAG: each node i in 2..200 gets 1-2 parents < i
  private lazy val dagEdges: Seq[(Long, Long)] = {
    val rng = new scala.util.Random(42)
    (2 to 200).flatMap { i =>
      val nParents = 1 + rng.nextInt(2)
      Seq.fill(nParents)((i.toLong, (1 + rng.nextInt(i - 1)).toLong)).distinct
    }
  }

  private def bruteClosure(edges: Seq[(Long, Long)]): Set[(Long, Long)] = {
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def reach(n: Long): Set[Long] = {
      var seen = Set.empty[Long]
      var frontier = adj.getOrElse(n, Set.empty)
      while (frontier.nonEmpty) {
        seen ++= frontier
        frontier = frontier.flatMap(m => adj.getOrElse(m, Set.empty)) -- seen
      }
      seen
    }
    adj.keySet.flatMap(n => reach(n).map(n -> _))
  }

  test("closure equals brute-force reachability on a random DAG (W20)") {
    val out = PropertyPath.closure(dagEdges.toDF("child", "parent"))
      .as[(Long, Long)].collect().toSet
    out shouldBe bruteClosure(dagEdges)
  }

  test("doubling converges in O(log diameter) rounds, not O(diameter)") {
    // a 256-hop chain: frontier BFS would need 256 rounds; doubling needs
    // ceil(log2(256)) = 8 plus one fixpoint-detection round
    val chain = (2L to 257L).map(i => (i, i - 1)).toDF("child", "parent")
    val stats = PropertyPath.closureWithStats(chain)
    stats.pairs.count() shouldBe 256L * 257 / 2
    stats.rounds should be <= 9
  }

  test("reliable checkpoint variant produces identical results (W20 + D6)") {
    val ckptRoot = graft.Scratch.fresh("reliable_ckpt")
    spark.sparkContext.setCheckpointDir(ckptRoot)
    val local = PropertyPath.closure(dagEdges.toDF("child", "parent"))
      .as[(Long, Long)].collect().toSet
    val reliable = PropertyPath.closure(dagEdges.toDF("child", "parent"), reliable = true)
      .as[(Long, Long)].collect().toSet
    reliable shouldBe local
    // superseded rounds' checkpoint FILES must be deleted as the loop
    // advances (Spark's own cleaner only runs with cleanCheckpoints=true
    // and after GC) — only the returned fixpoint frame's rdd dir survives
    def rddDirs: Seq[java.io.File] =
      Option(new java.io.File(ckptRoot).listFiles()).toSeq.flatten
        .flatMap(d => Option(d.listFiles()).toSeq.flatten)
        .filter(f => f.isDirectory && f.getName.startsWith("rdd-"))
    rddDirs.size shouldBe 1

    // same flag on connected components (undirected pair graph)
    val pairs = dagEdges.toDF("a", "b")
    val ccLocal = ConnectedComponents.run(pairs)
      .as[(Long, Long)].collect().toSet
    val ccReliable = ConnectedComponents.run(pairs, reliable = true)
      .as[(Long, Long)].collect().toSet
    ccReliable shouldBe ccLocal
  }

  test("hopDistances: BFS min distance, multi-source min, unreachable absent (W27)") {
    //   1 → 2 → 3 → 4     5 → 3 (shortcut)    9 isolated target of nothing
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 3L), (8L, 9L))
      .toDF("src", "dst")
    val single = PropertyPath.hopDistances(edges, Seq(1L).toDF("id"))
      .as[(Long, Long)].collect().toMap
    single shouldBe Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L) // 5/8/9 unreachable
    // multi-source: 3 settles at dist 1 via source 5, not 2 via source 1
    val multi = PropertyPath.hopDistances(edges, Seq(1L, 5L).toDF("id"))
      .as[(Long, Long)].collect().toMap
    multi shouldBe Map(1L -> 0L, 5L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L)
    // a cycle settles each node once and terminates
    val cyc = PropertyPath.hopDistances(
      Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst"), Seq(1L).toDF("id"))
      .as[(Long, Long)].collect().toMap
    cyc shouldBe Map(1L -> 0L, 2L -> 1L, 3L -> 2L)
    // an unsettled frontier past maxRounds fails loudly
    an[IllegalArgumentException] should be thrownBy
      PropertyPath.hopDistances(edges, Seq(1L).toDF("id"), maxRounds = 2)
  }
}
