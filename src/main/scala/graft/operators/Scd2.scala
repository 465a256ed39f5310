package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** R34: slowly-changing-dimension Type 2 — turn a CDC change feed into a
  * versioned dimension table: one row per (key, version) carrying
  * `[valid_from, valid_to)` sequence bounds and an `is_current` flag, the
  * point-in-time form warehouse fact joins need (join on key AND
  * fact.seq ∈ [valid_from, valid_to) — R18's as-of join and R30's range
  * join are the consumers). Completes the CDC family: R25 applies changes
  * to a snapshot, R31/X9 maintain aggregates, X8 maintains row state,
  * SCD2 keeps the full history queryable.
  *
  * Semantics: I/U rows open a version at their `seqCol`; the next change
  * to the same key (any op) closes it exclusively at its seq. D rows are
  * tombstones — they close the prior version but emit no row themselves,
  * and a later re-insert simply opens a new version. `is_current` marks
  * rows whose interval is unbounded. Ties on (key, seq) are broken by a
  * content hash (cdcMerge's rule) so even contract-breaking feeds produce
  * ONE deterministic history.
  *
  * Scale shape: one clustering shuffle on the key; the lead() window is
  * per key ordered by seq, so partition size is a key's CHANGE COUNT —
  * bounded by update frequency, never by corpus size. No driver state, no
  * second pass.
  */
object Scd2 {

  def fromChanges(changes: DataFrame, keys: Seq[String], seqCol: String,
      opCol: String = "op"): DataFrame = {
    val tie = xxhash64(to_json(struct(changes.columns.sorted.map(col): _*)))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(seqCol).asc, tie.asc)
    changes
      .withColumn("valid_from", col(seqCol).cast("long"))
      .withColumn("valid_to", lead(col(seqCol).cast("long"), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull && col(opCol) =!= "D")
      .filter(col(opCol) =!= "D")
      .drop(opCol)
  }
}
