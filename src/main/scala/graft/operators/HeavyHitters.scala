package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** R46: exact heavy hitters via a Misra–Gries candidate pass — "which
  * values exceed φ = 1/(capacity+1) of the stream", the skew-diagnosis /
  * hot-key-discovery primitive (feeding e.g. R16's salt list or a cache
  * policy) that a plain `GROUP BY key ORDER BY count DESC` answers only
  * by shuffling EVERY distinct key — at 100 TB that is a full-cardinality
  * shuffle to find a handful of values.
  *
  * Two passes, both cheap at scale:
  *   1. sketch: the `MisraGries` TypedImperativeAggregate collapses each
  *      partition to ≤ capacity counters and merges partials pairwise —
  *      fixed memory, no raw-value shuffle. Its guarantee: every key with
  *      frequency > n/(capacity+1) is among the candidates.
  *   2. verify: the ≤ capacity candidates broadcast back over the corpus;
  *      matching rows (a tiny fraction) hash-aggregate to EXACT counts,
  *      and the strict threshold `cnt * (capacity+1) > n` keeps exactly
  *      the true heavy hitters.
  * The sketch's merge-order-dependent extras are filtered out by the
  * exact pass, so the final frame is DETERMINISTIC — a pure function of
  * the multiset, independent of partitioning (spec-asserted), which is
  * what makes it oracle-checkable at all.
  */
object HeavyHitters {

  /** Keys of `keyCol` (long) with frequency strictly above
    * n/(capacity+1), with exact counts: (`item`, `cnt`) sorted by item. */
  def exact(df: DataFrame, keyCol: String, capacity: Int): DataFrame = {
    // internal names: a corpus key column literally named "item" or "n"
    // must not collide with the candidate frame (review-caught)
    val sketch = df.agg(
      graft.functions.FrequentItems.misraGries(col(keyCol), capacity).as("__hh_cand"),
      count(col(keyCol)).as("__hh_n"))
    val cands = sketch.select(explode(col("__hh_cand")).as("__hh_item"), col("__hh_n"))
    df.join(broadcast(cands), col(keyCol) === col("__hh_item"))
      .groupBy("__hh_item", "__hh_n").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * (capacity + 1) > col("__hh_n"))
      .select(col("__hh_item").as("item"), col("cnt"))
      .orderBy("item")
  }
}
