package graft.operators

import graft.SparkSpec
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** R49: shallow clone — zero-copy fork, full divergence both ways, stats
  * skipping through the relative paths, vacuum safety, error surface. */
class SnapshotCloneSpec extends SparkSpec {
  import spark.implicits._

  private def rows(r: Range) = r.map(i => (i.toLong, s"v$i")).toDF("id", "s")

  test("clone reads the source version without copying any data (R49)") {
    val src = graft.Scratch.fresh("clone_src")
    val dst = graft.Scratch.fresh("clone_dst")
    SnapshotTable.commit(spark, src, rows(0 until 50))
    SnapshotTable.commit(spark, src, rows(50 until 80), mode = SnapshotTable.Append)
    SnapshotTable.shallowClone(src, dst) shouldBe 1L
    Files.isDirectory(Paths.get(dst, "data")) shouldBe false
    SnapshotTable.read(spark, dst).select("id").as[Long].collect().toSet shouldBe
      (0L until 80L).toSet
    // pinned-version clone
    val dst1 = graft.Scratch.fresh("clone_dst1")
    SnapshotTable.shallowClone(src, dst1, version = 1L)
    SnapshotTable.read(spark, dst1).select("id").as[Long].collect().toSet shouldBe
      (0L until 50L).toSet
  }

  test("source and clone diverge independently after the fork (R49)") {
    val src = graft.Scratch.fresh("clone_div_src")
    val dst = graft.Scratch.fresh("clone_div_dst")
    SnapshotTable.commit(spark, src, rows(0 until 30))
    SnapshotTable.shallowClone(src, dst)
    SnapshotTable.commit(spark, dst, rows(100 until 110), mode = SnapshotTable.Append)
    SnapshotTable.commit(spark, src, rows(200 until 205)) // overwrite source
    SnapshotTable.read(spark, src).select("id").as[Long].collect().toSet shouldBe
      (200L until 205L).toSet
    SnapshotTable.read(spark, dst).select("id").as[Long].collect().toSet shouldBe
      ((0L until 30L) ++ (100L until 110L)).toSet
    // the clone's append wrote into the CLONE's own data directory
    Files.isDirectory(Paths.get(dst, "data")) shouldBe true
  }

  test("stats skipping keeps working through the clone's relative paths (R49)") {
    val src = graft.Scratch.fresh("clone_stats_src")
    val dst = graft.Scratch.fresh("clone_stats_dst")
    // range-clustered so per-file id ranges are disjoint
    SnapshotTable.commit(spark, src,
      rows(0 until 4000).repartitionByRange(8, col("id")).sortWithinPartitions("id"))
    SnapshotTable.shallowClone(src, dst)
    SnapshotTable.prunedFiles(spark, dst, col("id") < 500L)._2 should not be empty
    SnapshotTable.readPruned(spark, dst, col("id") < 500L)
      .select("id").as[Long].collect().toSet shouldBe (0L until 500L).toSet
  }

  test("vacuuming the clone can never reclaim source files (R49)") {
    val src = graft.Scratch.fresh("clone_vac_src")
    val dst = graft.Scratch.fresh("clone_vac_dst")
    SnapshotTable.commit(spark, src, rows(0 until 20))
    SnapshotTable.shallowClone(src, dst)
    SnapshotTable.commit(spark, dst, rows(50 until 60)) // overwrite: v2 owns its files
    SnapshotTable.vacuum(dst, keepFrom = 2L)
    SnapshotTable.read(spark, dst).select("id").as[Long].collect().toSet shouldBe
      (50L until 60L).toSet
    // the source is untouched by the clone's vacuum
    SnapshotTable.read(spark, src).select("id").as[Long].collect().toSet shouldBe
      (0L until 20L).toSet
  }

  test("clone rejects a used destination and an uncommitted source (R49)") {
    val src = graft.Scratch.fresh("clone_err_src")
    val dst = graft.Scratch.fresh("clone_err_dst")
    SnapshotTable.commit(spark, src, rows(0 until 5))
    SnapshotTable.commit(spark, dst, rows(0 until 5))
    an[IllegalArgumentException] should be thrownBy
      SnapshotTable.shallowClone(src, dst)
    an[IllegalArgumentException] should be thrownBy
      SnapshotTable.shallowClone(graft.Scratch.fresh("clone_err_none"),
        graft.Scratch.fresh("clone_err_dst2"))
    an[IllegalArgumentException] should be thrownBy
      SnapshotTable.shallowClone(src, graft.Scratch.fresh("clone_err_dst3"),
        version = 9L)
  }
}
