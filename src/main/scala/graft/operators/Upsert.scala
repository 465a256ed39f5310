package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC apply / upsert (SURVEY.md §2.2 R25): merge a changeset of
  * insert/update/delete row images into a snapshot — MERGE INTO semantics
  * over plain frames.
  *
  * The reference rebuilds its whole SQLite file from a full dump every run
  * (and refuses to overwrite an existing one — src/main.rs:98-104); at
  * 100 TB a full rebuild is days of cluster time, so applying the daily
  * incremental dump is the only viable refresh path. This is the engine for
  * it: updates replace the current row image, deletes remove it, inserts
  * append.
  *
  * Shape: ONE left-anti join of the snapshot against the changeset's keys
  * (drops every updated/deleted row), then a union with the non-delete
  * images — no window functions, no full-table sort. Changesets are tiny
  * next to snapshots, so Catalyst broadcasts the anti-join side and the
  * snapshot never shuffles. At scale pair with partition pruning: rewrite
  * only the partitions that contain changed keys (copy-on-write à la
  * Delta/Hudi) by pre-filtering the snapshot scan on the changeset's
  * partition values.
  */
object Upsert {

  /** Apply `changes` (same schema as `snapshot` plus `opCol` ∈ I/U/D) to
    * `snapshot`, keyed by `keyCols`. Last-writer-wins within the changeset
    * is the CALLER's contract: a changeset must carry at most one image per
    * key (dedupe upstream with `Dedup.exactDedup`-style keep-latest if the
    * source can emit several). */
  def applyChanges(snapshot: DataFrame, changes: DataFrame,
      keyCols: Seq[String], opCol: String = "op"): DataFrame =
    snapshot
      .join(changes.select(keyCols.map(col): _*), keyCols, "left_anti")
      .unionByName(changes.filter(col(opCol) =!= "D").drop(opCol))
}
