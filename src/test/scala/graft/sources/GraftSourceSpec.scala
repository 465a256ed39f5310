package graft.sources

import graft.SparkSpec
import graft.operators.SnapshotTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** R57: the snapshot format as a Spark DataSourceV2 (`format("graft")`). */
class GraftSourceSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(): (String, Long) = {
    val t = graft.Scratch.fresh("dsv2_table")
    val rows = (1 to 100).map(i => (i.toLong, s"row-$i", i * 10))
    SnapshotTable.commit(spark, t,
      rows.filter(_._1 <= 40).toDF("id", "name", "score"))
    Thread.sleep(5); val t1 = System.currentTimeMillis(); Thread.sleep(5)
    SnapshotTable.commit(spark, t,
      rows.filter(_._1 > 40).toDF("id", "name", "score"),
      mode = SnapshotTable.Append)
    (t, t1)
  }

  private def ids(df: DataFrame): Set[Long] =
    df.select("id").as[Long].collect().toSet

  test("format('graft') reads the latest version and matches the API read (R57)") {
    val (t, _) = mkTable()
    val viaFormat = spark.read.format("graft").load(t)
    viaFormat.schema.fieldNames.toSet shouldBe Set("id", "name", "score")
    ids(viaFormat) shouldBe ids(SnapshotTable.read(spark, t))
    ids(viaFormat) shouldBe (1L to 100L).toSet
  }

  test("versionAsOf and timestampAsOf pin exactly what the API pins (R57)") {
    val (t, t1) = mkTable()
    ids(spark.read.format("graft").option("versionAsOf", 1).load(t)) shouldBe
      (1L to 40L).toSet
    // timestampAsOf accepts epoch millis and a local-timestamp string
    ids(spark.read.format("graft").option("timestampAsOf", t1.toString).load(t)) shouldBe
      (1L to 40L).toSet
    val asStr = new java.sql.Timestamp(t1).toString
    ids(spark.read.format("graft").option("timestampAsOf", asStr).load(t)) shouldBe
      (1L to 40L).toSet
  }

  test("snapshot isolation: a later commit never changes a resolved read (R57)") {
    val (t, _) = mkTable()
    val pinned = spark.read.format("graft").load(t) // resolves to v2 at plan time
    SnapshotTable.commit(spark, t, Seq((999L, "late", 0)).toDF("id", "name", "score"))
    ids(pinned) shouldBe (1L to 100L).toSet // the overwrite v3 is invisible
    ids(spark.read.format("graft").load(t)) shouldBe Set(999L) // a fresh read sees it
  }

  test("filters push down and columns prune through the connector (R57 scale shape)") {
    val (t, _) = mkTable()
    val df = spark.read.format("graft").load(t)
      .filter(col("score") > 900).select("id")
    val plan = df.queryExecution.executedPlan.toString
    plan should include("PushedFilters: [IsNotNull(score), GreaterThan(score,900)]")
    plan should include("ReadSchema: struct<id:bigint,score:int>")
    ids(df) shouldBe (91L to 100L).toSet
  }

  test("bad options fail loudly; the source is read-only (R57)") {
    val (t, _) = mkTable()
    intercept[IllegalArgumentException] {
      spark.read.format("graft")
        .option("versionAsOf", 1).option("timestampAsOf", "1")
        .load(t).collect()
    }
    intercept[Exception] {
      spark.read.format("graft").load(t, t) // multi-path has no meaning here
    }
    intercept[Exception] { // no SupportsWrite: commits must go through the API
      Seq((1L, "x", 1)).toDF("id", "name", "score")
        .write.format("graft").mode("append").save(t)
    }
  }
}
