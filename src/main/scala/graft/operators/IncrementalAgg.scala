package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** R31: incremental aggregate maintenance (SURVEY.md §2.2) — keep a
  * grouped (count, sums) rollup current under a CDC change feed WITHOUT
  * rescanning the base table: the view-maintenance counterpart of R25's
  * row-level upsert and X8's streaming CDC state.
  *
  * count and sum are self-maintainable: an insert contributes (+1, +x), a
  * delete (-1, -x), and an update is a delete of the old image plus an
  * insert of the new one (the caller's CDC contract — the same before/after
  * pair a Debezium-style feed carries). Merging is a full-outer join of the
  * delta rollup (changes-sized) against the state on the group keys;
  * groups whose maintained count reaches zero disappear, exactly as a
  * recompute would drop them. Derived aggregates (avg = sum/count) come
  * from the maintained pair at read time.
  *
  * Scale shape: the delta rollup shuffles only the changeset with map-side
  * partial aggregation; the merge join shuffles state ∪ delta on the group
  * keys — and the STATE of an aggregate rollup is |distinct groups| rows,
  * not |base| rows, which is what makes maintenance at 100 TB base size
  * cheap: the base is never read again. Store the state bucketed by the
  * group keys (R17) and even that join goes shuffle-free. Sums should be
  * DECIMAL (exact, associative); double sums drift run-to-run at high
  * parallelism.
  */
object IncrementalAgg {

  /** The maintained-sum contract requires associative, exact addition: the
    * n==0 residual guard in [[applyDelta]] compares sums accumulated in
    * different orders, which only holds bit-exactly for integral/DECIMAL
    * types. Reject float/double at call time so the contract violation is
    * an immediate API error, not a spurious mid-stream raise_error on a
    * legitimately-emptied group with ~1e-16 roundoff residue. */
  private def requireExactSumTypes(df: DataFrame, sumCols: Seq[String]): Unit = {
    import org.apache.spark.sql.types.{DoubleType, FloatType}
    val bad = sumCols.filter { c =>
      df.schema(c).dataType match {
        case DoubleType | FloatType => true
        case _ => false
      }
    }
    require(bad.isEmpty,
      s"IncrementalAgg sum columns must be exact (integral/DECIMAL) types; " +
        s"floating-point sums drift by accumulation order and break the " +
        s"emptied-group residual check: ${bad.mkString(", ")} — cast to DECIMAL first")
  }

  /** Build the initial maintained state: one row per key combination with
    * `n` (live row count) and `sum_<c>` per value column. */
  def sumState(rows: DataFrame, keys: Seq[String], sumCols: Seq[String]): DataFrame = {
    requireExactSumTypes(rows, sumCols)
    rows.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sumCols.map(c => sum(col(c)).as(s"sum_$c")): _*)
  }

  /** Merge one CDC changeset into the maintained state. `changes` carries
    * the key columns, the value columns, and `opCol` ∈ {"I", "D"} (updates
    * arrive as D-old + I-new pairs). Returns the new state frame, same
    * schema as [[sumState]]; groups with no surviving rows are dropped. */
  def applyDelta(state: DataFrame, changes: DataFrame, keys: Seq[String],
      opCol: String, sumCols: Seq[String]): DataFrame = {
    requireExactSumTypes(changes, sumCols)
    val sign = when(col(opCol) === "D", lit(-1)).otherwise(lit(1))
    val delta = changes.groupBy(keys.map(col): _*)
      .agg(sum(sign).as("__dn"),
        sumCols.map(c => sum(col(c) * sign).as(s"__d_$c")): _*)
    val merged = state.join(delta, keys, "full_outer")
    val zero = lit(0)
    val n = coalesce(col("n"), zero) + coalesce(col("__dn"), zero)
    val mergedSum = sumCols.map(c => c ->
      (coalesce(col(s"sum_$c"), zero) + coalesce(col(s"__d_$c"), zero))).toMap
    // A group emptied by deletes must also zero its maintained sums; a
    // nonzero residual means a delete's value image mismatched state — the
    // same violated-CDC-contract class the n < 0 guard catches. Exact for
    // DECIMAL/integral sums (the documented contract); double sums could
    // trip on association-order roundoff, one more reason they are wrong
    // here (see the class doc).
    val residual = sumCols.map(c => mergedSum(c) =!= zero)
      .reduceOption(_ || _).getOrElse(lit(false))
    merged.select(
      keys.map(col) ++
        // n < 0 means a delete for rows the state never held — a violated
        // CDC contract (e.g. a redelivered changeset applied without the
        // ivmApplyBatch version guard). Dropping it like a cleanly-emptied
        // group would silently corrupt the rollup; fail loudly instead.
        Seq(when(n < 0 || (n === 0 && residual),
            raise_error(concat(lit("IncrementalAgg: inconsistent delta for group "),
            concat_ws(",", keys.map(k => col(k).cast("string")): _*))))
          .otherwise(n).as("n")) ++
        sumCols.map(c => mergedSum(c).as(s"sum_$c")): _*)
      .filter(col("n") > 0)
  }
}
