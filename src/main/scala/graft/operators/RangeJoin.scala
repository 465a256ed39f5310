package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** R30: range joins without a nested loop (SURVEY.md §2.2).
  *
  * Spark plans a join whose only predicate is an inequality
  * (`point BETWEEN start AND end`, `aStart <= bEnd && bStart <= aEnd`) as a
  * BroadcastNestedLoopJoin — O(|L|·|R|) compares and a broadcast of one
  * whole side, the classic 100 TB cliff for event-to-window enrichment
  * (readings → calibration intervals, events → campaign windows, trades →
  * quote validity ranges) when NO equi-key exists to hash on.
  *
  * The fix is the standard binning decomposition: quantize the range
  * domain into fixed-width bins, explode each interval to the bins it
  * covers, tag each point with its single containing bin, and equi-join on
  * the bin id — a plain shuffled hash/sort-merge join whose per-bin work is
  * data-local, followed by the exact predicate as a post-filter. Output is
  * IDENTICAL to the naive join (binning only prunes pairs the predicate
  * would reject); a point lives in exactly one bin, so point-in-interval
  * needs no dedup at all, and interval-overlap dedups by attributing each
  * pair to one canonical bin (the bin of the later start) instead of a
  * distinct pass. Bin width trades explode fan-out (intervals spanning
  * many bins) against per-bin pair volume; `spanBins` ≈ typical interval
  * length / binSize stays O(1) when binSize is chosen near the typical
  * interval length.
  *
  * All domain columns are LONG (epoch days/seconds/millis — caller picks
  * the unit); bin ids use floor division written as exact integer algebra
  * (`(a - pmod(a, b)) div b`), correct for negative domains, where `div`
  * alone truncates toward zero.
  */
object RangeJoin {

  /** floor(`sqlExpr` / b) in exact integer arithmetic: pmod is
    * non-negative, so subtracting it lands on the bin's floor multiple and
    * `div` (exact long division) never sees a negative remainder. */
  private def floorDiv(sqlExpr: String, b: Long): Column =
    expr(s"(($sqlExpr) - pmod($sqlExpr, $b)) div $b")

  /** Inner-join `points` to every interval containing them:
    * `start <= point <= end` (inclusive both ends), no equi-key needed.
    * One explode (≤ span/binSize + 1 rows per interval) + one equi-join on
    * the bin id; never a nested loop. Column sets must be disjoint. */
  def pointInInterval(intervals: DataFrame, points: DataFrame,
      startCol: String, endCol: String, pointCol: String,
      binSize: Long): DataFrame = {
    require(binSize > 0, s"need binSize > 0, got $binSize")
    // a start > end interval matches nothing — drop it BEFORE the explode:
    // sequence() would otherwise auto-step -1 and materialize a huge
    // descending bin range for one malformed row
    val binned = intervals.filter(col(startCol) <= col(endCol))
      .withColumn("__bin", explode(sequence(
        floorDiv(s"`$startCol`", binSize), floorDiv(s"`$endCol`", binSize))))
    val tagged = points.withColumn("__bin", floorDiv(s"`$pointCol`", binSize))
    binned.join(tagged, "__bin")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bin")
  }

  /** Inner-join overlapping interval pairs: `aStart <= bEnd AND
    * bStart <= aEnd` (inclusive touch counts). Both sides explode to their
    * covered bins; a pair overlapping across k shared bins is attributed to
    * exactly one — the bin containing the LATER of the two starts, which
    * both sides cover by definition of overlap — so no distinct pass over
    * the join output is needed. */
  def intervalOverlap(left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      binSize: Long): DataFrame = {
    require(binSize > 0, s"need binSize > 0, got $binSize")
    // empty (start > end) intervals overlap nothing; see pointInInterval
    val l = left.filter(col(lStart) <= col(lEnd))
      .withColumn("__bin", explode(sequence(
        floorDiv(s"`$lStart`", binSize), floorDiv(s"`$lEnd`", binSize))))
    val r = right.filter(col(rStart) <= col(rEnd))
      .withColumn("__bin", explode(sequence(
        floorDiv(s"`$rStart`", binSize), floorDiv(s"`$rEnd`", binSize))))
    l.join(r, "__bin")
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col("__bin") === floorDiv(s"greatest(`$lStart`, `$rStart`)", binSize))
      .drop("__bin")
  }
}
