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

  // ------------------------------------------------------------- W29

  /** Reference meet set: full BFS from both ends, nodes minimizing
    * da + db (= the nodes on some shortest path), with the distance. */
  private def bruteMeet(edges: Seq[(Long, Long)], src: Long,
      dst: Long): Set[(Long, Long)] = {
    def bfsLevels(adj: Map[Long, Seq[Long]], s: Long): Map[Long, Long] = {
      var dist = Map(s -> 0L); var frontier = Set(s); var d = 0L
      while (frontier.nonEmpty) {
        d += 1
        val next = frontier.flatMap(u => adj.getOrElse(u, Seq.empty))
          .filterNot(dist.contains)
        next.foreach(v => dist += v -> d)
        frontier = next
      }
      dist
    }
    val fwd = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val bwd = edges.map(e => (e._2, e._1)).groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val da = bfsLevels(fwd, src)
    val db = bfsLevels(bwd, dst)
    val common = da.keySet intersect db.keySet
    if (common.isEmpty) Set.empty
    else {
      val best = common.map(u => da(u) + db(u)).min
      common.collect { case u if da(u) + db(u) == best => (u, best) }
    }
  }

  private def runMeet(edges: Seq[(Long, Long)], src: Long, dst: Long): Set[(Long, Long)] =
    PropertyPath.shortestMeet(edges.toDF("src", "dst"), src, dst)
      .as[(Long, Long)].collect().toSet

  test("shortestMeet ≡ brute force on random graphs, both directions (W29)") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val n = 60 + trial * 20
      val edges = Seq.fill(n * 3)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      runMeet(edges, 0L, (n - 1).toLong) shouldBe bruteMeet(edges, 0L, (n - 1).toLong)
      runMeet(edges, (n - 1).toLong, 0L) shouldBe bruteMeet(edges, (n - 1).toLong, 0L)
    }
  }

  test("self pair, adjacent pair, unreachable pair (W29)") {
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
    runMeet(chain, 2L, 2L) shouldBe Set((2L, 0L))
    runMeet(chain, 1L, 2L) shouldBe Set((1L, 1L), (2L, 1L))
    runMeet(chain, 1L, 11L) shouldBe Set.empty
    runMeet(chain, 4L, 1L) shouldBe Set.empty // edges are directed
  }

  test("meet certificate is the full on-a-shortest-path set (W29)") {
    // diamond: 1 → {2, 3} → 4, plus a longer detour 1 → 5 → 6 → 4
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L),
      (1L, 5L), (5L, 6L), (6L, 4L))
    runMeet(edges, 1L, 4L) shouldBe Set((1L, 2L), (2L, 2L), (3L, 2L), (4L, 2L))
  }

  test("deep chain: every path node certifies; an undersized round budget fails loudly (W29)") {
    val chain = (1L until 60L).map(i => (i, i + 1))
    runMeet(chain, 1L, 60L) shouldBe (1L to 60L).map(i => (i, 59L)).toSet
    an[IllegalArgumentException] should be thrownBy
      PropertyPath.shortestMeet(chain.toDF("src", "dst"), 1L, 60L, maxRounds = 20)
  }
  test("cycleAudit flags exactly the loop members; acyclic graphs report nothing (W31)") {
    // 14-node tree with one planted back-edge 3 -> 6: loop {3, 6}
    val tree = spark.range(2, 16).select(col("id").as("src"), expr("id div 2").as("dst"))
    val out = PropertyPath.cycleAudit(
        tree.unionByName(Seq((3L, 6L)).toDF("src", "dst")))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    out.filter(_._2).keySet shouldBe Set(3L, 6L)
    // tainted = the loop members plus every descendant of node 3 (6, 7,
    // 12..15 — their ancestor chains pass through the loop)
    out.keySet shouldBe Set(3L, 6L, 7L, 12L, 13L, 14L, 15L)
    // a pure k-cycle converges and everything is on it
    val ring = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val ringOut = PropertyPath.cycleAudit(ring).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    ringOut shouldBe Map(1L -> true, 2L -> true, 3L -> true, 4L -> true)
    // acyclic: empty report
    PropertyPath.cycleAudit(tree).count() shouldBe 0L
  }
}
