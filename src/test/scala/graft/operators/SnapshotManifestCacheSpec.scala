package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Manifest-parse memoization: snapshot RESOLUTION (versionAsOf / hasTag /
  * history / read planning) over a long-lived table must not re-read every
  * retained manifest on every call — at 10⁴ commits that serializes
  * planning on driver JSON I/O. Published manifests are immutable, so one
  * parse per manifest per process is the correct cost. */
class SnapshotManifestCacheSpec extends SparkSpec {
  import spark.implicits._
  import SnapshotTable._

  test("resolution over many versions parses each manifest once; new commits add only their own parse") {
    val t = graft.Scratch.fresh("mcache")
    (1 to 20).foreach { i =>
      commit(spark, t, Seq((i.toLong, s"v$i")).toDF("k", "s"),
        mode = Append, tag = Some(s"b$i"))
    }
    // warm every resolution surface once
    val cutoff = commitTime(t, 20L).get
    versionAsOf(t, cutoff) shouldBe 20L
    hasTag(t, "b7") shouldBe true
    history(spark, t).count() shouldBe 20L
    val warm = manifestParsesOf(t)
    warm should be <= 25L // each manifest parsed ~once during warm-up

    // every subsequent full-scan resolution is served from cache: ZERO
    // further JSON parses, however many times planning asks
    versionAsOf(t, cutoff) shouldBe 20L
    hasTag(t, "b13") shouldBe true
    hasTag(t, "nope") shouldBe false
    history(spark, t).count() shouldBe 20L
    read(spark, t, 20L).count() shouldBe 20L
    manifestParsesOf(t) shouldBe warm

    // a new commit costs exactly its OWN manifest parse (+ the Append
    // parent lookup, already cached), never a rescan of the log
    commit(spark, t, Seq((99L, "x")).toDF("k", "s"), mode = Append)
    versionAsOf(t, commitTime(t, 21L).get) shouldBe 21L
    hasTag(t, "b3") shouldBe true
    manifestParsesOf(t) should be <= warm + 1
  }

  test("a table recreated at the same path never serves a stale cached parse") {
    val t = graft.Scratch.fresh("mcache_recreate")
    commit(spark, t, Seq((1L, "old")).toDF("k", "s"))
    read(spark, t, 1L).select("s").as[String].head() shouldBe "old"
    // wipe and recreate the SAME path with different v1 content
    def rm(p: java.nio.file.Path): Unit = {
      val walk = java.nio.file.Files.walk(p)
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      } finally walk.close()
    }
    rm(java.nio.file.Paths.get(t))
    commit(spark, t, Seq((1L, "new")).toDF("k", "s"))
    read(spark, t, 1L).select("s").as[String].head() shouldBe "new"
    tagOf(t, 1L) shouldBe None
  }
}
