package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** R44: change-data-feed reads — the feed is the NET logical diff between
  * two versions (rewrite-carried rows suppressed), the append history
  * short-circuits to a join-free plan, and applying the feed forward
  * reproduces the target version exactly. */
class SnapshotCdcSpec extends SparkSpec {
  import spark.implicits._
  import SnapshotTable._

  private def base(name: String): String = {
    val t = graft.Scratch.fresh(name)
    commit(spark, t, spark.range(4000L).select(col("id").as("k"),
        (col("id") % 7).as("g"), format_string("v%06d", col("id")).as("s"))
      .repartitionByRange(8, col("k")).sortWithinPartitions("k"))
    t
  }

  private def content(df: DataFrame): Map[String, Int] =
    df.collect().map(_.toString).groupBy(identity).view.mapValues(_.length).toMap

  test("append-only range: every new-file row is an I, and the plan has no join (R44 fast path)") {
    val t = base("cdc_append")
    commit(spark, t,
      spark.range(4000L, 4100L).select(col("id").as("k"), lit(0L).as("g"), lit("A").as("s")),
      mode = Append)
    val feed = changesBetween(spark, t, 1L, 2L, Seq("k"))
    feed.groupBy("op").count().as[(String, Long)].collect().toMap shouldBe Map("I" -> 100L)
    feed.select(min("k"), max("k")).as[(Long, Long)].head() shouldBe ((4000L, 4099L))
    val physical = feed.queryExecution.executedPlan.toString
    assert(!physical.contains("Join"), s"append fast path planned a join:\n$physical")
  }

  test("merge changeset: the feed is exactly the net changes, carried rows suppressed (R44)") {
    val t = base("cdc_merge")
    val changes = spark.range(100L, 150L).select(col("id").as("k"),
        (col("id") % 7).as("g"), lit("UPD").as("s"), lit("U").as("op"))
      .unionByName(spark.range(200L, 230L).select(col("id").as("k"),
        (col("id") % 7).as("g"), lit("x").as("s"), lit("D").as("op")))
      .unionByName(spark.range(3L).select((col("id") + 100000L).as("k"),
        lit(1L).as("g"), lit("NEW").as("s"), lit("I").as("op")))
    merge(spark, t, changes, Seq("k"))
    val feed = changesBetween(spark, t, 1L, 2L, Seq("k"))
    val expected = content(
      spark.range(100L, 150L).select(col("id").as("k"), (col("id") % 7).as("g"),
          format_string("v%06d", col("id")).as("s"), lit("U_pre").as("op"))
      .unionByName(spark.range(100L, 150L).select(col("id").as("k"),
        (col("id") % 7).as("g"), lit("UPD").as("s"), lit("U_post").as("op")))
      .unionByName(spark.range(200L, 230L).select(col("id").as("k"),
        (col("id") % 7).as("g"), format_string("v%06d", col("id")).as("s"),
        lit("D").as("op")))
      .unionByName(spark.range(3L).select((col("id") + 100000L).as("k"),
        lit(1L).as("g"), lit("NEW").as("s"), lit("I").as("op"))))
    content(feed) shouldBe expected
  }

  test("OPTIMIZE between the versions yields an EMPTY feed (R44 × R41)") {
    val t = base("cdc_optimize")
    optimize(spark, t, targetBytes = 64L * 1024 * 1024)
    changesBetween(spark, t, 1L, 2L, Seq("k")).count() shouldBe 0L
    // and z-order too — a pure layout change is not a logical change
    optimize(spark, t, zorderCols = Seq("g", "k"))
    changesBetween(spark, t, 1L, 3L, Seq("k")).count() shouldBe 0L
  }

  test("net semantics: insert-then-delete vanishes, insert-then-update is one I with the final image (R44)") {
    val t = base("cdc_net")
    merge(spark, t, Seq((90000L, 0L, "born", "I"), (90001L, 0L, "kept", "I"))
      .toDF("k", "g", "s", "op"), Seq("k"))
    merge(spark, t, Seq((90000L, 0L, "x", "D"), (90001L, 0L, "final", "U"))
      .toDF("k", "g", "s", "op"), Seq("k"))
    val feed = changesBetween(spark, t, 1L, 3L, Seq("k"))
      .filter(col("k") >= 90000L)
    feed.select("k", "s", "op").as[(Long, String, String)].collect().toSet shouldBe
      Set((90001L, "final", "I"))
  }

  test("fromVersion = 0 bootstraps: the whole target version as I (R44)") {
    val t = base("cdc_bootstrap")
    val feed = changesBetween(spark, t, 0L, 1L, Seq("k"))
    feed.filter(col("op") =!= "I").count() shouldBe 0L
    content(feed.drop("op")) shouldBe content(read(spark, t, 1L))
  }

  test("a CDC range spanning schema evolution diffs in the target schema (R44)") {
    val t = graft.Scratch.fresh("cdc_schema")
    commit(spark, t, Seq((1L, "a"), (2L, "b")).toDF("k", "s"))
    // v2 overwrites with an ADDED column; v1 files lack it entirely
    commit(spark, t, Seq((1L, "a", 10L), (3L, "c", 30L)).toDF("k", "s", "extra"))
    val feed = changesBetween(spark, t, 1L, 2L, Seq("k"))
      .select("k", "s", "extra", "op")
      .as[(Long, String, Option[Long], String)].collect().toSet
    feed shouldBe Set(
      (1L, "a", None, "U_pre"),      // old image null-fills the new column
      (1L, "a", Some(10L), "U_post"),
      (2L, "b", None, "D"),
      (3L, "c", Some(30L), "I"))
  }

  test("fold contract: read(from) + feed ≡ read(to) (R44 apply-forward)") {
    val t = base("cdc_fold")
    val changes = spark.range(500L, 560L).select(col("id").as("k"),
        (col("id") % 7).as("g"), lit("UPD").as("s"), lit("U").as("op"))
      .unionByName(spark.range(700L, 720L).select(col("id").as("k"),
        lit(0L).as("g"), lit("x").as("s"), lit("D").as("op")))
      .unionByName(spark.range(4L).select((col("id") + 200000L).as("k"),
        lit(2L).as("g"), lit("NEW").as("s"), lit("I").as("op")))
    merge(spark, t, changes, Seq("k"))
    val feed = changesBetween(spark, t, 1L, 2L, Seq("k"))
    // project the 4-op feed onto applyChanges' I/U/D single-image form
    val asIUD = feed.filter(col("op") =!= "U_pre")
      .withColumn("op", when(col("op") === "U_post", "U").otherwise(col("op")))
    content(Upsert.applyChanges(read(spark, t, 1L), asIUD, Seq("k"))) shouldBe
      content(read(spark, t, 2L))
  }
}
