package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** R47: metadata-only RESTORE — content returns to the target version
  * with zero data movement, history stays readable, the CDC feed across
  * a restore is the inverse of the undone span, vacuum keeps the
  * restored files live, CAS loses loudly, bad targets reject. */
class SnapshotRestoreSpec extends SparkSpec {
  import spark.implicits._
  import SnapshotTable._

  private def content(df: DataFrame): Map[String, Int] =
    df.collect().map(_.toString).groupBy(identity).view.mapValues(_.length).toMap

  private def threeVersions(name: String): String = {
    val t = graft.Scratch.fresh(name)
    commit(spark, t, spark.range(1000L).select(col("id").as("k"),
      format_string("v%04d", col("id")).as("s")))
    commit(spark, t, spark.range(500L).select(col("id").as("k"), lit("CLOBBER").as("s")))
    commit(spark, t, spark.range(20L).select((col("id") + 9000L).as("k"),
      lit("EXTRA").as("s")), mode = Append)
    t
  }

  test("restore returns latest to the target's content without touching data (R47)") {
    val t = threeVersions("restore_basic")
    val v1 = content(read(spark, t, 1L))
    restore(t, 1L) shouldBe 4L
    content(read(spark, t)) shouldBe v1
    filesOf(t, 4L) shouldBe filesOf(t, 1L) // metadata-only, zero new files
    // history preserved: the undone versions stay readable by number
    content(read(spark, t, 3L)).keySet.exists(_.contains("EXTRA")) shouldBe true
    // a restore is itself restorable
    restore(t, 3L) shouldBe 5L
    content(read(spark, t)) shouldBe content(read(spark, t, 3L))
  }

  test("the CDC feed across a restore is the inverse of the undone span (R47)") {
    val t = graft.Scratch.fresh("restore_cdc")
    commit(spark, t, spark.range(2000L).select(col("id").as("k"),
        format_string("v%05d", col("id")).as("s"))
      .repartitionByRange(4, col("k")).sortWithinPartitions("k"))
    val changes = spark.range(100L, 140L).select(col("id").as("k"),
        lit("UPD").as("s"), lit("U").as("op"))
      .unionByName(spark.range(300L, 310L).select(col("id").as("k"),
        lit("x").as("s"), lit("D").as("op")))
    merge(spark, t, changes, Seq("k"))
    restore(t, 1L) shouldBe 3L
    // folding the (v2 → v3) feed onto v2 must land exactly on v1
    val feed = changesBetween(spark, t, 2L, 3L, Seq("k"))
    val asIUD = feed.filter(col("op") =!= "U_pre")
      .withColumn("op", when(col("op") === "U_post", "U").otherwise(col("op")))
    content(Upsert.applyChanges(read(spark, t, 2L), asIUD, Seq("k"))) shouldBe
      content(read(spark, t, 1L))
  }

  test("vacuum keeps the restored version's files live (R47)") {
    val t = threeVersions("restore_vacuum")
    val v = restore(t, 1L)
    val expected = content(read(spark, t, 1L))
    vacuum(t, keepFrom = v) // drops manifests 1-3; v4 references v1's FILES
    content(read(spark, t)) shouldBe expected
    versions(t) shouldBe Seq(4L)
  }

  test("CAS race loses loudly; uncommitted targets reject (R47)") {
    val t = threeVersions("restore_cas")
    an[ConcurrentCommitException] should be thrownBy
      restore(t, 1L, expectedVersion = 2L) // head is 3
    an[IllegalArgumentException] should be thrownBy restore(t, 99L)
    restore(t, 1L, expectedVersion = 3L) shouldBe 4L
  }
}
