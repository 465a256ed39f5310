package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (SURVEY.md §2.2 R18): for every left row, the latest right row
  * with `right.time <= left.time` within the same key — the
  * point-in-time-correct lookup every event/feature pipeline needs (last
  * price before the trade, last click before the purchase).
  *
  * Spark has no ASOF JOIN operator, and the naive formulation
  * (`l JOIN r ON key AND r.ts <= l.ts` + max-per-group) explodes into a
  * range join — every left row pairs with ALL earlier right rows, O(n·m)
  * per key at 100 TB. This is the scalable union-window formulation
  * instead: tag both sides, union, ONE shuffle on the key, sort by
  * (time, side) within partitions, and carry the right side's values
  * forward with `last_value(ignoreNulls)` — right rows sort before left
  * rows at equal timestamps, so "at or before" is exact. Cost: one
  * hash shuffle + per-partition sort, same shape as any windowed agg.
  */
object AsofJoin {

  /** Left rows with `asofCols` (renamed `asof_<col>`) carried from the
    * latest right row at-or-before each left row's `timeCol`, NULL when no
    * such row exists (LEFT OUTER as-of semantics). Both frames need
    * `keyCols` + `timeCol`; other column names must not clash. */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      timeCol: String, asofCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // ALL asof columns ride in ONE non-null struct per right row (struct()
    // of null fields is still non-null). Carrying columns individually with
    // last(ignoreNulls) would skip a matched row's genuine NULL (an older
    // row's value leaks in) and could stitch values from DIFFERENT right
    // rows; the single-struct carry preserves exactly one matched row,
    // NULLs included.
    val rStruct = org.apache.spark.sql.types.StructType(
      asofCols.map(c => org.apache.spark.sql.types.StructField(c, right.schema(c).dataType)))
    // tagged union: right rows (side=0) sort before left rows (side=1) at
    // equal event time, making the match inclusive ("at or before")
    val taggedLeft = left.withColumn("__side", lit(1))
      .withColumn("__r", lit(null).cast(rStruct))
    val taggedRight = {
      val base = right.select(keyCols.map(col) ++ Seq(col(timeCol)) :+
        struct(asofCols.map(col): _*).as("__r"): _*)
      val withNulls = leftCols.filterNot(keyCols.contains).filterNot(_ == timeCol)
        .foldLeft(base.withColumn("__side", lit(0))) {
          (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
        }
      withNulls.select(taggedLeft.columns.map(col): _*) // align column order
    }
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(timeCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = taggedLeft.unionAll(taggedRight)
      .withColumn("__rlast", last(col("__r"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        asofCols.map(c => col("__rlast").getField(c).as(s"asof_$c")): _*)
  }
}
