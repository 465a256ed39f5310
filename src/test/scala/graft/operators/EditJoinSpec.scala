package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EditJoinSpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("ed<=1 join is COMPLETE and exact vs brute force (D16)") {
    // substitutions, insertions, deletions, equal pairs, near-misses (ed 2)
    val rng = new scala.util.Random(7)
    val alpha = "abcd" // small alphabet → dense collisions
    val strs = Seq.fill(160)(
      (1 to (3 + rng.nextInt(6))).map(_ => alpha(rng.nextInt(4))).mkString)
    val df = strs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "s")
    val got = EditJoin.pairsWithinEd1(df, "id", "s")
      .as[(Long, Long, Int)].collect().toSet
    val expect = (for {
      i <- strs.indices; j <- strs.indices if i < j
      d = lev(strs(i), strs(j)) if d <= 1
    } yield (i.toLong, j.toLong, d)).toSet
    got shouldBe expect
  }

  test("insert/delete across lengths and empty strings (D16)") {
    val df = Seq((0L, "spark"), (1L, "sparks"), (2L, "spak"), (3L, "spark"),
      (4L, ""), (5L, "a"), (6L, "zzzzz")).toDF("id", "s")
    val got = EditJoin.pairsWithinEd1(df, "id", "s")
      .as[(Long, Long, Int)].collect().toSet
    got shouldBe Set((0L, 1L, 1), (0L, 2L, 1), (0L, 3L, 0), (1L, 3L, 1),
      (2L, 3L, 1), (4L, 5L, 1))
  }

  test("no cross join in the plan (D16)") {
    val df = Seq((0L, "ab"), (1L, "ac")).toDF("id", "s")
    val plan = EditJoin.pairsWithinEd1(df, "id", "s")
      .queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("fuzzyLookup probes the variant index and matches brute force (W32)") {
    val rng = new scala.util.Random(11)
    val strs = Seq.tabulate(120)(i =>
      (1 to (3 + rng.nextInt(5))).map(_ => "abcde"(rng.nextInt(5))).mkString)
    val df = strs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "lbl")
    val idx = EditJoin.variantIndex(df, "id", "lbl")
    for (term <- Seq(strs(5), strs(5).drop(1), "q" + strs(9), strs(17).updated(0, 'z'), "zzzz")) {
      val got = EditJoin.fuzzyLookup(idx, df, "id", "lbl", term)
        .select("id", "dist").as[(Long, Int)].collect().toSet
      val expect = strs.zipWithIndex.collect {
        case (s, i) if lev(s, term) <= 1 => (i.toLong, lev(s, term))
      }.toSet
      got shouldBe expect
    }
  }

  test("k=2 join is COMPLETE and exact vs brute force (D16)") {
    val rng = new scala.util.Random(23)
    val strs = Seq.fill(110)(
      (1 to (4 + rng.nextInt(5))).map(_ => "abc"(rng.nextInt(3))).mkString)
    val df = strs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "s")
    val got = EditJoin.pairsWithin(df, "id", "s", k = 2)
      .as[(Long, Long, Int)].collect().toSet
    val expect = (for {
      i <- strs.indices; j <- strs.indices if i < j
      d = lev(strs(i), strs(j)) if d <= 2
    } yield (i.toLong, j.toLong, d)).toSet
    got shouldBe expect
  }

  test("stored variant index: pruned probe ≡ in-memory lookup (W33)") {
    val rng = new scala.util.Random(31)
    val strs = Seq.tabulate(300)(i =>
      (1 to (4 + rng.nextInt(6))).map(_ => "abcdef"(rng.nextInt(6))).mkString)
    val df = strs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "lbl")
    val t = graft.Scratch.fresh("w33spec_index")
    EditJoin.saveIndex(spark, t, df, "id", "lbl", files = 16)
    val idx = EditJoin.variantIndex(df, "id", "lbl")
    for (term <- Seq(strs(3), strs(7).drop(1), "zzzzz")) {
      val stored = EditJoin.fuzzyLookupStored(spark, t, df, "id", "lbl", term)
        .select("id", "dist").as[(Long, Int)].collect().toSet
      val mem = EditJoin.fuzzyLookup(idx, df, "id", "lbl", term)
        .select("id", "dist").as[(Long, Int)].collect().toSet
      stored shouldBe mem
      val (kept, skipped) = SnapshotTable.prunedFiles(spark, t,
        col("__h").isin(EditJoin.termVariantHashes(term): _*))
      skipped should not be empty
      kept.size should be <= EditJoin.termVariantHashes(term).size
    }
  }

  test("append-maintained index ≡ rebuild under adds/renames/deletes (W36)") {
    val rng = new scala.util.Random(47)
    val strs = Seq.tabulate(200)(i =>
      (1 to (4 + rng.nextInt(5))).map(_ => "abcde"(rng.nextInt(5))).mkString)
    val v1 = strs.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "lbl")
    // churn: rename every 7th (flip first char to 'z'), delete every 11th,
    // add 40 new ids
    val renamed = strs.zipWithIndex.collect {
      case (s, i) if i % 7 == 3 => (i.toLong, "z" + s.drop(1))
    }
    val addedRows = Seq.tabulate(40)(i => (1000L + i,
      (1 to (4 + rng.nextInt(5))).map(_ => "abcde"(rng.nextInt(5))).mkString))
    val currentRows = strs.zipWithIndex.collect {
      case (s, i) if i % 11 != 0 && i % 7 != 3 => (i.toLong, s)
    } ++ renamed.filter(_._1 % 11 != 0) ++ addedRows
    val current = currentRows.toDF("id", "lbl")
    val t = graft.Scratch.fresh("w36spec_index")
    EditJoin.saveIndex(spark, t, v1, "id", "lbl", files = 16)
    EditJoin.appendIndexDelta(spark, t, (renamed ++ addedRows).toDF("id", "lbl"), "id", "lbl")
    val probes = Seq(
      strs(3),                 // renamed id's OLD label: stale variants must self-neutralize
      "z" + strs(3).drop(1),   // its NEW label: only reachable through the delta
      addedRows.head._2,       // added label
      strs(11),                // deleted id's label: must drop at the current-labels join
      strs(20), "qqqqq")
    for (term <- probes) {
      val got = EditJoin.fuzzyLookupStored(spark, t, current, "id", "lbl", term)
        .select("id", "dist").as[(Long, Int)].collect().toSet
      val expect = currentRows.collect {
        case (id, s) if lev(s, term) <= 1 => (id, lev(s, term))
      }.toSet
      got shouldBe expect
    }
    // the maintenance fold: one rebuild commit restores single-commit
    // clustering, answers unchanged
    EditJoin.saveIndex(spark, t, current, "id", "lbl", files = 16)
    for (term <- probes) {
      val got = EditJoin.fuzzyLookupStored(spark, t, current, "id", "lbl", term)
        .select("id", "dist").as[(Long, Int)].collect().toSet
      val expect = currentRows.collect {
        case (id, s) if lev(s, term) <= 1 => (id, lev(s, term))
      }.toSet
      got shouldBe expect
      val (kept, skipped) = SnapshotTable.prunedFiles(spark, t,
        col("__h").isin(EditJoin.termVariantHashes(term): _*))
      skipped should not be empty
      kept.size should be <= EditJoin.termVariantHashes(term).size
    }
  }
}
