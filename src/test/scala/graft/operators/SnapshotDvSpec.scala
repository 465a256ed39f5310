package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** R53: deletion vectors — no data rewrite, cumulative + idempotent
  * deletes, two-axis time travel, fold compaction with a CAS'd clear, and
  * the documented file-rewrite resurrection hazard fold exists to
  * prevent. */
class SnapshotDvSpec extends SparkSpec {
  import spark.implicits._

  private def rowsOf(t: String, v: Long = -1L, dvV: Long = -1L): Set[Long] =
    SnapshotDv.readMor(spark, t, v, dvV).select("k").as[Long].collect().toSet

  test("deletes are merge-on-read: cumulative, idempotent, zero files rewritten (R53)") {
    val t = graft.Scratch.fresh("dvspec_basic")
    val rows = (0L until 1000L).map(i => (i, s"v$i")).toDF("k", "v")
    SnapshotTable.commit(spark, t, rows.filter($"k" < 500).coalesce(2))
    SnapshotTable.commit(spark, t, rows.filter($"k" >= 500).coalesce(2),
      mode = SnapshotTable.Append)
    val files = SnapshotTable.filesOf(t)
    SnapshotDv.deleteWhere(spark, t, col("k") % 10 === 0)
    SnapshotDv.deleteWhere(spark, t, col("k") % 7 === 0)
    SnapshotDv.deleteWhere(spark, t, col("k") % 10 === 0) // re-delete: harmless
    SnapshotTable.filesOf(t) shouldBe files
    rowsOf(t) shouldBe (0L until 1000L).filter(k => k % 10 != 0 && k % 7 != 0).toSet
    // two-axis time travel: dv version 1 removes only the first batch
    rowsOf(t, dvV = 1L) shouldBe (0L until 1000L).filterNot(_ % 10 == 0).toSet
  }

  test("fold rewrites survivors, clears DVs, preserves the visible rows (R53)") {
    val t = graft.Scratch.fresh("dvspec_fold")
    SnapshotTable.commit(spark, t,
      (0L until 300L).map(i => (i, i * 2)).toDF("k", "v").coalesce(2))
    SnapshotDv.deleteWhere(spark, t, col("k") % 3 === 0)
    val before = rowsOf(t)
    SnapshotDv.fold(spark, t)
    SnapshotDv.vectors(spark, t).count() shouldBe 0L
    rowsOf(t) shouldBe before
    SnapshotTable.read(spark, t).count() shouldBe before.size.toLong
    // a delete racing the fold fails the DV clear loudly
    SnapshotDv.deleteWhere(spark, t, col("k") === 1L)
    val staleDv = SnapshotTable.latestVersion(s"$t/_dv").get
    SnapshotDv.deleteWhere(spark, t, col("k") === 2L) // the racing delete
    intercept[SnapshotTable.ConcurrentCommitException] {
      SnapshotTable.commit(spark, s"$t/_dv",
        spark.range(0).select(lit("").as("file"), col("id").as("pos")).limit(0),
        mode = SnapshotTable.Overwrite, expectedVersion = staleDv): Unit
    }
  }

  test("a file rewrite without fold resurrects deleted rows — the hazard fold prevents (R53)") {
    val t = graft.Scratch.fresh("dvspec_hazard")
    SnapshotTable.commit(spark, t, (0L until 100L).map(i => (i, i)).toDF("k", "v"))
    SnapshotDv.deleteWhere(spark, t, col("k") < 50)
    rowsOf(t) shouldBe (50L until 100L).toSet
    // an Overwrite that rewrites the rows into NEW files: DVs key on file
    // names, so they no longer apply — exactly why fold-before-OPTIMIZE
    // is the documented contract
    SnapshotTable.commit(spark, t, SnapshotTable.read(spark, t))
    rowsOf(t) shouldBe (0L until 100L).toSet
    // with the contract followed, nothing resurrects
    val t2 = graft.Scratch.fresh("dvspec_safe")
    SnapshotTable.commit(spark, t2, (0L until 100L).map(i => (i, i)).toDF("k", "v"))
    SnapshotDv.deleteWhere(spark, t2, col("k") < 50)
    SnapshotDv.fold(spark, t2)
    SnapshotTable.commit(spark, t2, SnapshotTable.read(spark, t2))
    rowsOf(t2) shouldBe (50L until 100L).toSet
  }
}
