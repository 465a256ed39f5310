package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** R42: manifest-level data skipping — footer-stat capture, conservative
  * predicate pruning, exactness via the residual filter, and the R41
  * interplay (z-order OPTIMIZE turns an unprunable layout prunable). */
class SnapshotStatsSpec extends SparkSpec {
  import spark.implicits._
  import SnapshotTable._

  /** id 0..n-1 range-clustered on k, plus a string and a double column. */
  private def clustered(name: String, n: Int = 10000, parts: Int = 20): String = {
    val t = graft.Scratch.fresh(name)
    val df = spark.range(n.toLong).select(
      col("id").as("k"),
      format_string("s%05d", col("id")).as("s"),
      (col("id") * 7 % 1000).cast("double").as("x"))
    commit(spark, t, df.repartitionByRange(parts, col("k")).sortWithinPartitions("k"))
    t
  }

  private def keptOf(t: String, pred: org.apache.spark.sql.Column): (Int, Int) = {
    val (kept, skipped) = prunedFiles(spark, t, pred)
    (kept.size, kept.size + skipped.size)
  }

  test("selective range reads plan a fraction of the files, rows exact (R42)") {
    val t = clustered("stats_range")
    val pred = col("k") >= 4000 && col("k") < 4500
    val (kept, total) = keptOf(t, pred)
    total shouldBe 20
    kept should be <= 3
    readPruned(spark, t, pred).agg(count("*"), sum("k")).as[(Long, Long)].head() shouldBe
      ((500L, (4000L until 4500L).sum))
  }

  test("string, Or, In and literal-first shapes prune; point miss plans zero files (R42)") {
    val t = clustered("stats_shapes")
    keptOf(t, col("s") < "s00500")._1 should be <= 2
    keptOf(t, col("k") === 123 || col("k") === 9876)._1 should be <= 2
    keptOf(t, col("k").isin(5, 9995))._1 should be <= 2
    keptOf(t, lit(100L) > col("k"))._1 should be <= 1
    // a key past every range: zero files, empty-but-typed result
    val none = col("k") === 123456789L
    keptOf(t, none)._1 shouldBe 0
    readPruned(spark, t, none).count() shouldBe 0L
    readPruned(spark, t, none).columns.toSeq shouldBe Seq("k", "s", "x")
  }

  test("unsupported predicates and stat-less columns keep every file (R42 conservatism)") {
    val t = clustered("stats_conserve")
    keptOf(t, col("k") + 1 === 5)._1 shouldBe 20          // expression over attr
    keptOf(t, col("s").contains("s01"))._1 shouldBe 20    // non-range shape
    keptOf(t, col("k").isNull)._1 shouldBe 20             // null test
    // results still exact when nothing prunes
    readPruned(spark, t, col("k") + 1 === 5).as[(Long, String, Double)].head()._1 shouldBe 4L
  }

  test("string pruning uses UTF-8 byte order, not UTF-16; NaN literals disable pruning instead of throwing (R42)") {
    val t = graft.Scratch.fresh("stats_utf8")
    // "￿" sorts ABOVE the emoji in UTF-16 code units but BELOW it in
    // UTF-8 bytes (the order parquet computed the footer max in) — a
    // compareTo-based range check would prune the file and lose the row
    val df = Seq(("￿", 1L), ("😀", 2L), ("aaa", 3L)).toDF("s", "k")
    commit(spark, t, df.coalesce(1))
    readPruned(spark, t, col("s") === "￿").select("k").as[Long].collect().toSeq shouldBe Seq(1L)
    // NaN has no BigDecimal form: must degrade to no-pruning, never throw
    val tn = graft.Scratch.fresh("stats_nan")
    commit(spark, tn, Seq((1L, 1.5), (2L, Double.NaN)).toDF("k", "x").coalesce(1))
    readPruned(spark, tn, col("x") === Double.NaN).count() shouldBe
      read(spark, tn).filter(col("x") === Double.NaN).count()
    // ±Infinity in a column's FOOTER stats drops only that column's ranges —
    // the sibling columns of the same commit must still prune
    val ti = graft.Scratch.fresh("stats_inf")
    commit(spark, ti, spark.range(1000L).select(col("id").as("k"),
        when(col("id") % 2 === 0, lit(Double.PositiveInfinity))
          .otherwise(lit(1.0)).as("x")) // Infinity rows
      .repartitionByRange(4, col("k")).sortWithinPartitions("k"))
    val (kept, skipped) = prunedFiles(spark, ti, col("k") < 100L)
    assert(skipped.nonEmpty, "k ranges lost to the Infinity column")
    readPruned(spark, ti, col("k") < 100L).count() shouldBe 100L
  }

  test("hash-fragmented table prunes nothing until R41 z-order OPTIMIZE, then almost everything (R41×R42)") {
    val t = graft.Scratch.fresh("stats_optimize")
    val df = spark.range(20000L).select(col("id").as("k"),
      (col("id") % 100).as("g"), (col("id") * 13 % 997).cast("double").as("x"))
    commit(spark, t, df.repartition(24)) // hash layout: every file spans the range
    val pred = col("k") >= 1000 && col("k") < 1400
    val before = keptOf(t, pred)
    before._1 shouldBe before._2 // nothing prunable
    optimize(spark, t, targetBytes = 64L * 1024, zorderCols = Seq("k"))
    val (kept, total) = keptOf(t, pred)
    assert(kept * 3 < total, s"kept $kept of $total after optimize")
    readPruned(spark, t, pred).agg(sum("k")).as[Long].head() shouldBe
      (1000L until 1400L).sum
  }

  test("wide IN lists (optimizer InSet form) still prune (R42/W33)") {
    val t = clustered("stats_inset")
    // > inSetConversionThreshold (10) elements: the optimizer rewrites the
    // In to InSet with raw internal values — must prune like narrow IN
    val hits = (0 until 12).map(i => (i * 3L) + 5L)
    keptOf(t, col("k").isin(hits: _*))._1 should be <= 2
    val misses = (0 until 12).map(i => 1000000L + i)
    keptOf(t, col("k").isin(misses: _*))._1 shouldBe 0
    val mixed = misses :+ 9995L
    keptOf(t, col("k").isin(mixed: _*))._1 should be <= 1
  }

  test("rangeOverlaps: O(1) interval overlap for wide-changeset MERGE pruning, conservative on incomparables (R43)") {
    import SnapshotStats.{ColStats, rangeOverlaps}
    def bd(n: Int) = new java.math.BigDecimal(n)
    val st = ColStats(bd(100), bd(200))
    rangeOverlaps(st, 150, 160) shouldBe true // inside
    rangeOverlaps(st, 50, 300) shouldBe true  // covering
    rangeOverlaps(st, 50, 100) shouldBe true  // touching min
    rangeOverlaps(st, 200, 300) shouldBe true // touching max
    rangeOverlaps(st, 50, 99) shouldBe false  // wholly below
    rangeOverlaps(st, 201, 300) shouldBe false // wholly above
    rangeOverlaps(st, null, 150) shouldBe true // incomparable bound → keep
    rangeOverlaps(st, "a", "z") shouldBe true  // type mismatch → keep
    val ss = ColStats("bb", "dd")
    rangeOverlaps(ss, "aa", "cc") shouldBe true
    rangeOverlaps(ss, "ee", "ff") shouldBe false
    rangeOverlaps(ss, "aa", "ab") shouldBe false
    // long/double driver values render through toComparable like the
    // merge's agg(min, max) row does
    rangeOverlaps(st, java.lang.Long.valueOf(199L), java.lang.Long.valueOf(500L)) shouldBe true
    rangeOverlaps(st, java.lang.Double.valueOf(0.5), java.lang.Double.valueOf(1.5)) shouldBe false
  }
}
