package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** R61: the stats-driven join strategy law and its metadata plumbing. */
class StatsJoinSpec extends SparkSpec {
  import StatsJoin._

  private def st(rows: Long, bytes: Long, ndv: Long = -1L) =
    SideStats(if (rows >= 0) Some(rows) else None, bytes,
      if (ndv >= 0) Some(ndv) else None)

  test("strategy law: broadcast beats salt beats shuffle, in that order (R61)") {
    // smaller side under budget → broadcast that side
    choose(st(100, 1 << 20), st(1000000, 1L << 32), 10L << 20, 64) shouldBe BroadcastLeft
    choose(st(1000000, 1L << 32), st(100, 1 << 20), 10L << 20, 64) shouldBe BroadcastRight
    // both over budget, bigger side's key NDV below the parallelism
    // target → salted, sized to cover the target
    choose(st(1000000, 1L << 32, 10), st(500000, 1L << 31, 10), 10L << 20, 64) shouldBe Salted(7)
    // salts bounded: tiny NDV does not explode the small side ×huge
    choose(st(1000000, 1L << 32, 1), st(500000, 1L << 31), 10L << 20, 100000) shouldBe Salted(64)
    // NDV at/above parallelism, or unknown → plain shuffle
    choose(st(1000000, 1L << 32, 64), st(500000, 1L << 31), 10L << 20, 64) shouldBe Shuffle
    choose(st(1000000, 1L << 32), st(500000, 1L << 31), 10L << 20, 64) shouldBe Shuffle
    // the NDV that matters is the BIGGER side's: small-side NDV must not salt
    choose(st(1000000, 1L << 32), st(500000, 1L << 31, 5), 10L << 20, 64) shouldBe Shuffle
  }

  test("sideStats reads manifest bytes and sidecar NDV with zero data I/O (R61)") {
    import spark.implicits._
    val t = graft.Scratch.fresh("r61spec_t")
    val df = (0L until 1000L).map(i => (i, i % 10)).toDF("id", "k")
    SnapshotTable.commit(spark, t, df)
    // before ANALYZE: bytes known (manifest), NDV unknown (no sidecar)
    val pre = sideStats(spark, t, "k")
    pre.bytes should be > 0L
    pre.keyNdv shouldBe None
    pre.rows shouldBe None
    SnapshotAnalyze.analyze(spark, t, Seq("k"))
    val post = sideStats(spark, t, "k")
    post.rows shouldBe Some(1000L)
    post.keyNdv shouldBe Some(10L)
    post.bytes shouldBe pre.bytes
  }

  test("all three strategies produce the identical join answer (R61)") {
    import spark.implicits._
    val big = graft.Scratch.fresh("r61spec_big")
    val dim = graft.Scratch.fresh("r61spec_dim")
    SnapshotTable.commit(spark, big,
      (0L until 5000L).map(i => (i, i % 7)).toDF("id", "k"))
    SnapshotTable.commit(spark, dim,
      (0L until 7L).map(i => (i, s"name$i")).toDF("k", "name"))
    SnapshotAnalyze.analyze(spark, big, Seq("k"))
    SnapshotAnalyze.analyze(spark, dim, Seq("k"))
    val (s1, d1) = StatsJoin.join(spark, big, dim, "k")
    val (s2, d2) = StatsJoin.join(spark, big, dim, "k", broadcastBytes = 1L, parallelism = 64)
    val (s3, d3) = StatsJoin.join(spark, big, dim, "k", broadcastBytes = 1L, parallelism = 4)
    s1 shouldBe BroadcastRight
    s2 shouldBe Salted(10)
    s3 shouldBe Shuffle
    val a1 = d1.select("id", "k", "name").as[(Long, Long, String)].collect().toSet
    d2.select("id", "k", "name").as[(Long, Long, String)].collect().toSet shouldBe a1
    d3.select("id", "k", "name").as[(Long, Long, String)].collect().toSet shouldBe a1
    a1.size shouldBe 5000
  }

  test("un-analyzed tables degrade to broadcast-or-shuffle, never salt (R61)") {
    import spark.implicits._
    val big = graft.Scratch.fresh("r61spec_nb")
    val dim = graft.Scratch.fresh("r61spec_nd")
    SnapshotTable.commit(spark, big,
      (0L until 3000L).map(i => (i, i % 3)).toDF("id", "k"))
    SnapshotTable.commit(spark, dim,
      (0L until 3L).map(i => (i, s"n$i")).toDF("k", "name"))
    val (s2, d2) = StatsJoin.join(spark, big, dim, "k", broadcastBytes = 1L, parallelism = 64)
    s2 shouldBe Shuffle // NDV 3 would salt, but without the sidecar the law cannot know
    d2.count() shouldBe 3000L
  }

  test("choose with defaults: broadcast verdicts need no session; the shuffle path demands a target loudly (R61)") {
    val small = SideStats(Some(10L), 1024L, Some(10L))
    val big = SideStats(Some(1000000L), 1L << 30, Some(3L))
    // metadata-only broadcast verdict: no parallelism, no session — fine
    StatsJoin.choose(small, big) shouldBe BroadcastLeft
    StatsJoin.choose(big, small) shouldBe BroadcastRight
    // neither side fits: the law needs a parallelism target — a clear
    // requirement failure, not an NPE at spark.sessionState
    val e = intercept[IllegalArgumentException] { StatsJoin.choose(big, big) }
    e.getMessage should include("parallelism")
  }
}
