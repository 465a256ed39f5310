package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

/** R45: MV auto-rewrite — eligible aggregates are answered from the
  * registered rollup (plan-asserted via the scanned roots), every rewritten
  * shape matches the base-scan answer exactly, and ineligible shapes leave
  * the plan untouched. */
class MvRewriteSpec extends SparkSpec {
  import spark.implicits._

  /** Distinct dirs per test: the registry outlives a test, and a stale
    * entry over a reused path would shadow the new registration. */
  private def freshBase(tag: String): (String, String) = {
    MvRegistry.clear()
    val base = graft.Scratch.fresh(s"mvr_${tag}_base")
    val mv = graft.Scratch.fresh(s"mvr_${tag}_mv")
    raw().write.mode("overwrite").parquet(base)
    graft.operators.IncrementalAgg.sumState(
        spark.read.parquet(base), Seq("g", "h"), Seq("v", "w"))
      .write.mode("overwrite").parquet(mv)
    MvRewriteRule.attach(spark)
    MvRegistry.register(base, () => spark.read.parquet(mv),
      Seq("g", "h"), Seq("v", "w"))
    (base, mv)
  }

  private def raw(): DataFrame =
    spark.range(5000L).select(col("id").as("k"),
      (col("id") % 7).as("g"), (col("id") % 3).cast("string").as("h"),
      (col("id") % 101).cast("decimal(18,2)").as("v"),
      (col("id") % 13).as("w"))

  private def content(df: DataFrame): Set[String] = df.collect().map(_.toString).toSet

  private def scanRoots(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
        case _ => Seq.empty
      }
    }.flatten

  private def usesMv(df: DataFrame, base: String, mv: String): Boolean = {
    val roots = scanRoots(df)
    roots.exists(_.contains(mv.split('/').last)) &&
      !roots.exists(_.contains(base.split('/').last))
  }

  test("grouped sum + count answered from the MV, plan-asserted (R45)") {
    val (base, mv) = freshBase("sum")
    val q = spark.read.parquet(base).groupBy("g")
      .agg(sum("v").as("sv"), count(lit(1)).as("n"))
    assert(usesMv(q, base, mv), q.queryExecution.optimizedPlan.toString)
    content(q) shouldBe content(raw().groupBy("g")
      .agg(sum("v").as("sv"), count(lit(1)).as("n")))
  }

  test("group-key filter survives, remapped onto the MV (R45)") {
    val (base, mv) = freshBase("filter")
    val q = spark.read.parquet(base).filter(col("h") === "1")
      .groupBy("g").agg(sum("w").as("sw"))
    assert(usesMv(q, base, mv))
    content(q) shouldBe content(
      raw().filter(col("h") === "1").groupBy("g").agg(sum("w").as("sw")))
  }

  test("avg over a long column re-derives as sum/count (R45)") {
    val (base, mv) = freshBase("avg")
    val q = spark.read.parquet(base).groupBy("h").agg(avg("w").as("aw"))
    assert(usesMv(q, base, mv))
    content(q) shouldBe content(raw().groupBy("h").agg(avg("w").as("aw")))
  }

  test("global aggregate (no grouping) rewrites; count is 0 over an empty base (R45)") {
    val (base, mv) = freshBase("global")
    val q = spark.read.parquet(base).agg(count(lit(1)).as("n"), sum("v").as("sv"))
    assert(usesMv(q, base, mv))
    q.select("n").as[Long].head() shouldBe 5000L
    // empty base: the coalesce keeps the global count at 0, not null
    val eb = graft.Scratch.fresh("mvr_eb")
    val emv = graft.Scratch.fresh("mvr_emv")
    spark.range(0L).select(col("id").as("k"), (col("id") % 7).as("g"),
        (col("id") % 101).cast("decimal(18,2)").as("v"))
      .write.mode("overwrite").parquet(eb)
    graft.operators.IncrementalAgg.sumState(
        spark.read.parquet(eb), Seq("g"), Seq("v"))
      .write.mode("overwrite").parquet(emv)
    MvRegistry.register(eb, () => spark.read.parquet(emv), Seq("g"), Seq("v"))
    val eq = spark.read.parquet(eb).agg(count(lit(1)).as("n"))
    assert(usesMv(eq, eb, emv))
    eq.as[Long].head() shouldBe 0L
  }

  test("ineligible shapes leave the plan untouched (R45 guards)") {
    val (base, mv) = freshBase("guards")
    def untouched(df: DataFrame): Unit = {
      val roots = scanRoots(df)
      assert(roots.exists(_.contains(base.split('/').last)) &&
        !roots.exists(_.contains(mv.split('/').last)), roots.mkString("\n"))
    }
    // filter on a non-group column
    untouched(spark.read.parquet(base).filter(col("k") > 100)
      .groupBy("g").agg(sum("v")))
    // distinct aggregate
    untouched(spark.read.parquet(base).groupBy("g").agg(countDistinct("w")))
    // untracked measure column
    untouched(spark.read.parquet(base).groupBy("g").agg(sum("k")))
    // computed grouping expression
    untouched(spark.read.parquet(base).groupBy((col("g") + 1).as("g1")).agg(sum("v")))
    // grouping key outside the MV's vocabulary
    untouched(spark.read.parquet(base).groupBy("k").agg(sum("v")))
    // unregistered path
    val other = graft.Scratch.fresh("mvr_other")
    spark.range(10L).select(col("id").as("g"), col("id").cast("decimal(18,2)").as("v"))
      .write.mode("overwrite").parquet(other)
    val oq = spark.read.parquet(other).groupBy("g").agg(sum("v"))
    assert(scanRoots(oq).exists(_.contains("mvr_other")))
  }

  test("a broken registration degrades to no-rewrite, never a failed query (R45)") {
    val (base, mv) = freshBase("broken")
    MvRegistry.register(base,
      () => spark.read.parquet(mv + "/does-not-exist"), Seq("g", "h"), Seq("v", "w"))
    val q = spark.read.parquet(base).groupBy("g").agg(sum("v").as("sv"))
    assert(scanRoots(q).exists(_.contains(base.split('/').last)))
    content(q) shouldBe content(raw().groupBy("g").agg(sum("v").as("sv")))
  }

  test("version-pinned historical reads are NOT rewritten under exactFiles registration (R45)") {
    import graft.operators.{SnapshotIvm, SnapshotTable}
    MvRegistry.clear()
    val t = graft.Scratch.fresh("mvr_tt_base")
    val mvt = graft.Scratch.fresh("mvr_tt_mv")
    SnapshotTable.commit(spark, t, spark.range(200L).select(col("id").as("k"),
      (col("id") % 5).as("g"), (col("id") % 11).cast("decimal(18,2)").as("v")))
    SnapshotTable.merge(spark, t, Seq((0L, 0L, "99.00", "U")).toDF("k", "g", "v", "op")
      .withColumn("v", col("v").cast("decimal(18,2)")), Seq("k"))
    SnapshotIvm.refresh(spark, t, mvt, Seq("k"), Seq("g"), Seq("v")): Unit
    MvRewriteRule.attach(spark)
    MvRegistry.register(t, () => SnapshotTable.read(spark, mvt),
      Seq("g"), Seq("v"), exactFiles = SnapshotTable.filesOf(t))
    val latest = SnapshotTable.read(spark, t).groupBy("g").agg(sum("v").as("sv"))
    assert(usesMv(latest, t, mvt), "latest read should rewrite")
    // the v1 pinned read shares the root but not the file set — no rewrite,
    // and it must answer with v1's values (0.00 for k=0, not the merged 99)
    val pinned = SnapshotTable.read(spark, t, version = 1L)
      .groupBy("g").agg(sum("v").as("sv"))
    assert(!usesMv(pinned, t, mvt), "pinned read must keep its own scan")
    val v1 = pinned.filter(col("g") === 0L).select(col("sv").cast("string")).as[String].head()
    val vNow = latest.filter(col("g") === 0L).select(col("sv").cast("string")).as[String].head()
    assert(v1 != vNow, s"v1 answer $v1 must differ from latest $vNow")
  }

  test("rewritten aggregate keeps its output ids: downstream join binds (R45)") {
    val (base, mv) = freshBase("join")
    val agg = spark.read.parquet(base).groupBy("g").agg(sum("v").as("sv"))
    val dim = spark.range(7L).select(col("id").as("g"), concat(lit("g"), col("id")).as("nm"))
    val joined = agg.join(dim, "g").orderBy("g")
    assert(usesMv(joined, base, mv))
    joined.count() shouldBe 7L
  }

  test("rewrite ≡ base scan on every supported shape at once (R45 ground truth)") {
    val (base, mv) = freshBase("all")
    val q = spark.read.parquet(base).groupBy("g", "h")
      .agg(sum("v").as("sv"), sum("w").as("sw"), count(lit(1)).as("n"), avg("w").as("aw"))
    assert(usesMv(q, base, mv))
    content(q) shouldBe content(raw().groupBy("g", "h")
      .agg(sum("v").as("sv"), sum("w").as("sw"), count(lit(1)).as("n"), avg("w").as("aw")))
  }
}
