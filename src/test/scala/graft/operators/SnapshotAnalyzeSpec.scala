package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SnapshotAnalyzeSpec extends SparkSpec {
  import spark.implicits._

  test("profile counts rows/nulls/ndv and stringifies ranges (R60)") {
    val t = graft.Scratch.fresh("r60spec_t")
    val df = Seq((1L, Some("a")), (2L, None), (3L, Some("c")), (3L, Some("a")))
      .toDF("k", "v")
    SnapshotTable.commit(spark, t, df)
    val p = SnapshotAnalyze.profile(spark, t, Seq("k", "v"), exact = true)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getString(5))).toList
    p shouldBe List(
      ("k", 4L, 0L, 3L, "1", "3"),
      ("v", 4L, 1L, 2L, "a", "c"))
  }

  test("analyze persists once, readProfile is metadata-only and exact (R60)") {
    val t = graft.Scratch.fresh("r60spec_p")
    SnapshotTable.commit(spark, t,
      spark.range(0, 500).selectExpr("id AS k", "CAST(id % 7 AS STRING) AS v"))
    val v1 = SnapshotAnalyze.analyze(spark, t, Seq("k", "v"))
    // second analyze is a no-op (immutable stats of an immutable version)
    SnapshotAnalyze.analyze(spark, t, Seq("k", "v")) shouldBe v1
    val got = SnapshotAnalyze.readProfile(spark, t).get
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    got.toList shouldBe List(("k", 500L, 0L), ("v", 500L, 0L))
    // a later un-analyzed version has no profile; the old one persists
    SnapshotTable.commit(spark, t,
      spark.range(0, 10).selectExpr("id AS k", "'x' AS v"),
      mode = SnapshotTable.Append)
    SnapshotAnalyze.readProfile(spark, t) shouldBe None
    SnapshotAnalyze.readProfile(spark, t, v1).get.count() shouldBe 2L
  }

  test("sketch NDV lands within the documented bound (R60)") {
    val t = graft.Scratch.fresh("r60spec_s")
    SnapshotTable.commit(spark, t, spark.range(0, 20000).selectExpr("id AS k"))
    val r = SnapshotAnalyze.profile(spark, t, Seq("k"), exact = true)
      .collect().head
    val exact = r.getLong(3); val est = r.getLong(6)
    math.abs(est - exact).toDouble should be <= exact * 0.1
  }
}
