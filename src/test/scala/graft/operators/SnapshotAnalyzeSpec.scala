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

  test("mergeable analyze folds appends without rescanning the base (R62)") {
    import spark.implicits._
    val t = graft.Scratch.fresh("r62spec_t")
    def slice(lo: Long, hi: Long) = (lo until hi).map(i =>
      (i, if (i % 5 == 0) null else s"v${i % 37}", i.toDouble / 4)).toDF("id", "s", "d")
    SnapshotTable.commit(spark, t, slice(0, 4000))
    val (v1, inc1) = SnapshotAnalyze.analyzeMergeable(spark, t, Seq("id", "s", "d"))
    inc1 shouldBe false // first analyze: full
    SnapshotTable.commit(spark, t, slice(4000, 6000), SnapshotTable.Append)
    val (v2, inc2) = SnapshotAnalyze.analyzeMergeable(spark, t, Seq("id", "s", "d"))
    inc2 shouldBe true // append fold
    v2 shouldBe v1 + 1
    val merged = SnapshotAnalyze.readMergeableProfile(spark, t, v2).get.collect()
      .map(r => r.getString(0) -> r).toMap
    // counts and typed ranges are EXACT and equal a from-scratch profile
    val full = SnapshotAnalyze.profile(spark, t, Seq("id", "s", "d"), v2, exact = true)
      .collect().map(r => r.getString(0) -> r).toMap
    for (c <- Seq("id", "s", "d")) {
      merged(c).getLong(1) shouldBe full(c).getLong(1) // n_rows
      merged(c).getLong(2) shouldBe full(c).getLong(2) // n_nulls
      merged(c).getString(4) shouldBe full(c).getString(4) // min
      merged(c).getString(5) shouldBe full(c).getString(5) // max
      // sketch-union NDV within the R60 bound of the exact count
      val exact = full(c).getLong(3)
      math.abs(merged(c).getLong(3) - exact).toDouble should be <= exact * 0.1
    }
    // typed merge: id min must be "0", not a lexicographic artifact
    merged("id").getString(4) shouldBe "0"
    merged("id").getString(5) shouldBe "5999"
  }

  test("non-append commits force a full recompute; sidecars are idempotent (R62)") {
    import spark.implicits._
    val t = graft.Scratch.fresh("r62spec_ow")
    def df(n: Int) = (0 until n).map(i => (i.toLong, s"x$i")).toDF("id", "s")
    SnapshotTable.commit(spark, t, df(100))
    SnapshotAnalyze.analyzeMergeable(spark, t, Seq("id"))._2 shouldBe false
    // overwrite: file set is NOT a superset → full recompute
    SnapshotTable.commit(spark, t, df(50))
    val (v2, inc) = SnapshotAnalyze.analyzeMergeable(spark, t, Seq("id"))
    inc shouldBe false
    SnapshotAnalyze.readMergeableProfile(spark, t, v2).get
      .filter(col("column") === "id").collect().head.getLong(1) shouldBe 50L
    // re-analyze of an analyzed version no-ops (immutable sidecar)
    SnapshotAnalyze.analyzeMergeable(spark, t, Seq("id")) shouldBe ((v2, false))
  }

  test("a column-set change falls back to a full recompute, not a failure (R62)") {
    import spark.implicits._
    val t = graft.Scratch.fresh("r62spec_colchange")
    SnapshotTable.commit(spark, t,
      (0 until 100).map(i => (i.toLong, s"x$i")).toDF("id", "s"))
    SnapshotAnalyze.analyzeMergeable(spark, t, Seq("id"))
    SnapshotTable.commit(spark, t,
      (100 until 150).map(i => (i.toLong, s"x$i")).toDF("id", "s"),
      SnapshotTable.Append)
    // append-eligible, but the fold base only knows `id` — full recompute
    val (v2, inc) = SnapshotAnalyze.analyzeMergeable(spark, t, Seq("id", "s"))
    inc shouldBe false
    val m = SnapshotAnalyze.readMergeableProfile(spark, t, v2).get.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    m("id") shouldBe 150L
    m("s") shouldBe 150L
  }

  test("all-null columns and chained folds stay correct (R62)") {
    import spark.implicits._
    val t = graft.Scratch.fresh("r62spec_nulls")
    def slice(lo: Long, hi: Long) = (lo until hi)
      .map(i => (i, null: String)).toDF("id", "s")
    SnapshotTable.commit(spark, t, slice(0, 300))
    SnapshotAnalyze.analyzeMergeable(spark, t, Seq("id", "s"))
    SnapshotTable.commit(spark, t, slice(300, 500), SnapshotTable.Append)
    SnapshotAnalyze.analyzeMergeable(spark, t, Seq("id", "s"))._2 shouldBe true
    SnapshotTable.commit(spark, t, slice(500, 800), SnapshotTable.Append)
    val (v3, inc3) = SnapshotAnalyze.analyzeMergeable(spark, t, Seq("id", "s"))
    inc3 shouldBe true // folds onto the FOLDED state, not the original
    val m = SnapshotAnalyze.readMergeableProfile(spark, t, v3).get.collect()
      .map(r => r.getString(0) -> r).toMap
    m("s").getLong(1) shouldBe 800L
    m("s").getLong(2) shouldBe 800L // all null
    m("s").getLong(3) shouldBe 0L   // no sketch → NDV 0
    assert(m("s").isNullAt(4) && m("s").isNullAt(5))
    m("id").getLong(3).toDouble shouldBe 800.0 +- 40.0
  }
}
