package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def naivePoint(intervals: org.apache.spark.sql.DataFrame,
      points: org.apache.spark.sql.DataFrame) =
    intervals.join(points,
      col("p") >= col("s") && col("p") <= col("e"))
      .select("iid", "pid").as[(Long, Long)].collect().toSet

  test("pointInInterval equals the naive inequality join, negative domain included (R30)") {
    // intervals straddling 0 and bin boundaries; duplicate-width and point
    // ranges chosen so some intervals span 1, 2 and 4 bins
    val intervals = Seq(
      (1L, -25L, -10L), (2L, -5L, 5L), (3L, 0L, 0L), (4L, 7L, 40L),
      (5L, 12L, 12L), (6L, -40L, 35L)).toDF("iid", "s", "e")
    val points = (-45L to 45L).map(p => (100L + p, p)).toDF("pid", "p")
    for (bin <- Seq(1L, 7L, 10L, 64L)) {
      val got = RangeJoin.pointInInterval(intervals, points, "s", "e", "p", bin)
        .select("iid", "pid").as[(Long, Long)].collect().toSet
      got shouldBe naivePoint(intervals, points)
      withClue(s"bin=$bin: ") { got.size should be > 0 }
    }
  }

  test("malformed start > end intervals match nothing and never explode bins (R30)") {
    // without the guard, sequence() would auto-step -1 and materialize a
    // ~62M-element descending bin range for the corrupted row
    val intervals = Seq((1L, 1000000000L, 0L), (2L, 10L, 20L)).toDF("iid", "s", "e")
    val points = Seq((9L, 15L), (10L, 500L)).toDF("pid", "p")
    val got = RangeJoin.pointInInterval(intervals, points, "s", "e", "p", 16L)
      .select("iid", "pid").as[(Long, Long)].collect().toSet
    got shouldBe Set((2L, 9L))
    RangeJoin.intervalOverlap(
        intervals.toDF("aid", "as", "ae"), Seq((5L, 12L, 18L)).toDF("bid", "bs", "be"),
        "as", "ae", "bs", "be", 16L)
      .select("aid", "bid").as[(Long, Long)].collect().toSet shouldBe Set((2L, 5L))
  }

  test("pointInInterval emits each matching pair exactly once (R30)") {
    val intervals = Seq((1L, 0L, 100L)).toDF("iid", "s", "e")
    val points = Seq((9L, 50L)).toDF("pid", "p")
    // interval spans 11 bins of 10; the point is in exactly one → 1 row
    RangeJoin.pointInInterval(intervals, points, "s", "e", "p", 10L)
      .count() shouldBe 1L
  }

  test("intervalOverlap equals the naive overlap join with no duplicate pairs (R30)") {
    val left = Seq(
      (1L, -20L, -1L), (2L, 0L, 10L), (3L, 5L, 5L), (4L, 8L, 60L)).toDF("aid", "as", "ae")
    val right = Seq(
      (10L, -30L, -15L), (11L, -2L, 2L), (12L, 5L, 9L), (13L, 50L, 55L),
      (14L, 61L, 70L)).toDF("bid", "bs", "be")
    val naive = left.join(right, col("as") <= col("be") && col("bs") <= col("ae"))
      .select("aid", "bid").as[(Long, Long)].collect()
    for (bin <- Seq(1L, 4L, 16L)) {
      val got = RangeJoin.intervalOverlap(left, right, "as", "ae", "bs", "be", bin)
        .select("aid", "bid").as[(Long, Long)].collect()
      got.length shouldBe naive.length // no dup attribution across shared bins
      got.toSet shouldBe naive.toSet
    }
  }

  test("the binned plan is an equi-join, never a nested loop (R30)") {
    val intervals = (0L until 200L).map(i => (i, i * 3, i * 3 + 30)).toDF("iid", "s", "e")
    val points = (0L until 500L).map(p => (1000L + p, p)).toDF("pid", "p")
    val plan = RangeJoin.pointInInterval(intervals, points, "s", "e", "p", 32L)
      .queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
    (plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin")) shouldBe true
  }
}
