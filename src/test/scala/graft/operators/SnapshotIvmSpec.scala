package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X14: snapshot-table IVM — the maintained rollup tracks the base through
  * merge cycles exactly, refreshes are replay-idempotent and CAS-protected,
  * and emptied groups vanish as a recompute would drop them. */
class SnapshotIvmSpec extends SparkSpec {
  import spark.implicits._
  import SnapshotTable._

  private val keys = Seq("k")
  private val groups = Seq("g")
  private val sums = Seq("v")

  private def base(name: String): String = {
    val t = graft.Scratch.fresh(name)
    commit(spark, t, spark.range(3000L).select(col("id").as("k"),
        (col("id") % 11).as("g"), (col("id") % 97).cast("decimal(18,2)").as("v"))
      .repartitionByRange(8, col("k")).sortWithinPartitions("k"))
    t
  }

  private def mvOf(t: String): String = graft.Scratch.fresh(t.split('/').last + "_mv")

  private def sync(t: String, mv: String): Long =
    SnapshotIvm.refresh(spark, t, mv, keys, groups, sums)

  private def recompute(t: String): Map[String, Int] =
    content(IncrementalAgg.sumState(read(spark, t), groups, sums))

  private def content(df: DataFrame): Map[String, Int] =
    df.collect().map(_.toString).groupBy(identity).view.mapValues(_.length).toMap

  test("bootstrap refresh ≡ full rollup, tagged with the base version (X14)") {
    val t = base("ivm_boot"); val mv = mvOf(t)
    sync(t, mv) shouldBe 1L
    content(read(spark, mv)) shouldBe recompute(t)
    SnapshotIvm.reflectedVersion(mv) shouldBe 1L
  }

  test("incremental refresh after a merge ≡ recompute; replay is a no-op (X14)") {
    val t = base("ivm_incr"); val mv = mvOf(t)
    sync(t, mv)
    merge(spark, t, spark.range(40L, 90L).select(col("id").as("k"),
        (col("id") % 11).as("g"), lit(java.math.BigDecimal.valueOf(1000, 2)).as("v"),
        lit("U").as("op"))
      .unionByName(spark.range(500L, 540L).select(col("id").as("k"),
        (col("id") % 11).as("g"), lit(java.math.BigDecimal.ZERO).as("v"),
        lit("D").as("op")))
      .unionByName(spark.range(7L).select((col("id") + 50000L).as("k"),
        lit(3L).as("g"), lit(java.math.BigDecimal.valueOf(125, 2)).as("v"),
        lit("I").as("op"))), keys)
    val v = sync(t, mv)
    content(read(spark, mv)) shouldBe recompute(t)
    SnapshotIvm.reflectedVersion(mv) shouldBe 2L
    sync(t, mv) shouldBe v // base unchanged: refresh commits nothing
    latestVersion(mv) shouldBe Some(v)
  }

  test("groups emptied by deletes disappear from the MV (X14)") {
    val t = graft.Scratch.fresh("ivm_empty"); val mv = mvOf(t)
    commit(spark, t, Seq((1L, 1L, "10.00"), (2L, 1L, "20.00"), (3L, 2L, "30.00"))
      .toDF("k", "g", "v").withColumn("v", col("v").cast("decimal(18,2)")))
    sync(t, mv)
    merge(spark, t, Seq((1L, 1L, "0.00", "D"), (2L, 1L, "0.00", "D"))
      .toDF("k", "g", "v", "op").withColumn("v", col("v").cast("decimal(18,2)")), keys)
    sync(t, mv)
    read(spark, mv).select("g").as[Long].collect().toSeq shouldBe Seq(2L)
    content(read(spark, mv)) shouldBe recompute(t)
  }

  test("multi-cycle maintenance stays exact across three merges (X14)") {
    val t = base("ivm_multi"); val mv = mvOf(t)
    sync(t, mv)
    for (i <- 1 to 3) {
      merge(spark, t, spark.range(i * 100L, i * 100L + 30).select(
        col("id").as("k"), (col("id") % 11).as("g"),
        lit(java.math.BigDecimal.valueOf(i.toLong, 0)).cast("decimal(18,2)").as("v"),
        lit(if (i % 2 == 0) "D" else "U").as("op")), keys)
      sync(t, mv)
      content(read(spark, mv)) shouldBe recompute(t)
    }
    SnapshotIvm.reflectedVersion(mv) shouldBe 4L
  }

  test("a racing refresh loses the CAS instead of double-applying (X14)") {
    val t = base("ivm_cas"); val mv = mvOf(t)
    sync(t, mv)
    merge(spark, t, Seq((10L, 10L % 11, "99.00", "U")).toDF("k", "g", "v", "op")
      .withColumn("v", col("v").cast("decimal(18,2)")), keys)
    // simulate the race: another refresher lands between our version read
    // and our commit by bumping the MV underneath a manual stale commit
    sync(t, mv)
    intercept[ConcurrentCommitException] {
      commit(spark, mv, read(spark, mv), expectedVersion = 1L)
    }
    content(read(spark, mv)) shouldBe recompute(t)
  }
}
