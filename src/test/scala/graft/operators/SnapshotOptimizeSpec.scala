package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** R41: snapshot-preserving OPTIMIZE — content-identical rewrite committed
  * through the manifest log: file-count shrink, lineage intact, racing
  * writers win the CAS, vacuum reclaims the fragments. */
class SnapshotOptimizeSpec extends SparkSpec {
  import spark.implicits._
  import SnapshotTable._

  private def frag(name: String, n: Int = 2000, parts: Int = 32): String = {
    val t = graft.Scratch.fresh(name)
    val df = spark.range(n.toLong)
      .select(col("id").as("k"), (col("id") % 97).as("g"),
        (col("id") * 31 % 1009).cast("double").as("x"))
    commit(spark, t, df.repartition(parts))
    t
  }

  private def fileCount(t: String, v: Long): Int = {
    val json = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(t, "_log").resolve(f"v$v%016d.json")), "UTF-8")
    "\"([^\"]*\\.parquet)\"".r.findAllIn(json).length
  }

  private def content(t: String, v: Long = -1L): Map[String, Int] =
    read(spark, t, v).collect().map(_.toString).groupBy(identity)
      .view.mapValues(_.length).toMap

  test("compaction mode: same rows, far fewer files, old version intact (R41)") {
    val t = frag("opt_compact")
    val before = content(t, 1L)
    val v2 = optimize(spark, t)
    v2 shouldBe 2L
    content(t, 2L) shouldBe before
    fileCount(t, 2L) should be < fileCount(t, 1L) / 4
    content(t, 1L) shouldBe before // time travel unaffected
  }

  test("z-order mode: same rows, clustered layout, fewer files (R41)") {
    val t = frag("opt_zorder")
    val before = content(t, 1L)
    optimize(spark, t, zorderCols = Seq("g", "x"))
    content(t) shouldBe before
    fileCount(t, 2L) should be < fileCount(t, 1L)
  }

  test("a racing writer wins: OPTIMIZE loses the CAS and clobbers nothing (R41)") {
    val t = frag("opt_race", n = 200, parts = 8)
    // the concurrent commit lands inside the optimize's publish window
    intercept[ConcurrentCommitException] {
      optimize(spark, t, beforePublish = () =>
        commit(spark, t, Seq((-1L, -1L, 0.0)).toDF("k", "g", "x")))
    }
    // the writer's version is current; the failed optimize left no manifest
    latestVersion(t) shouldBe Some(2L)
    content(t) shouldBe Map("[-1,-1,0.0]" -> 1)
  }

  test("vacuum after optimize reclaims fragments, optimized version readable (R41)") {
    val t = frag("opt_vacuum")
    val before = content(t, 1L)
    optimize(spark, t)
    vacuum(t, keepFrom = 2L)
    content(t) shouldBe before
    versions(t) shouldBe Seq(2L)
    intercept[Exception] { read(spark, t, 1L).collect() } // manifest gone
  }
}
