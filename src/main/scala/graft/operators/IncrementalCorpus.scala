package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** P14: dedup-aware incremental corpus refresh — the production ingest loop
  * a crawl pipeline actually runs: a new batch arrives, is deduped within
  * itself, scrubbed against everything the corpus already holds, and ONLY
  * the novel documents land — one atomic, tagged, replay-safe Append. The
  * point is the cost model: a full rebuild re-dedupes |corpus|+|batch| docs
  * every crawl (the reference's rebuild-from-scratch posture, main.rs:98-104,
  * transplanted to corpora); the refresh touches |batch| texts plus ONE
  * NARROW COLUMN of the corpus.
  *
  * That column is the trick: the corpus snapshot table persists each
  * document's `content_hash` (md5 of the text) as a regular column, so the
  * novelty anti-join scans hash-column bytes only — parquet column pruning
  * does the rest; the corpus TEXT is never re-read, never re-hashed. At
  * 100 TB of text the hash column is ~0.2% of the table; a per-crawl scrub
  * reads gigabytes, not terabytes (and D8's bloom sketch can pre-filter the
  * batch side if even that scan wants amortizing across high-frequency
  * crawls).
  *
  * Semantics are FIRST-ARRIVAL-WINS, the only policy an incremental
  * pipeline can honor without rewriting history: within a batch the min id
  * wins (Dedup.exactDedup's deterministic tiebreak), across batches the
  * incumbent wins. The refresh therefore equals a full rebuild that ranks
  * by (arrival, id) — the invariant the p14 gate replays in SQL.
  *
  * Atomicity and replay ride the commit protocol: the Append is tagged, so
  * a crashed-and-retried crawl job checks [[SnapshotTable.hasTag]] and
  * no-ops instead of double-landing (the X13 discipline); readers see the
  * old corpus or the new one, never a half-landed batch. Downstream
  * maintenance (ANN store, search index, MVs) chains off the commit via
  * X22's log tail — no bespoke notification channel.
  */
object IncrementalCorpus {

  /** Hash column persisted in the corpus table. */
  val HashCol = "content_hash"

  /** Create the corpus table from the first crawl: internal exact dedup
    * (min id wins per content), hash column materialized alongside. */
  def bootstrap(spark: SparkSession, table: String, docs: DataFrame,
      textCol: String, idCol: String, tag: Option[String] = None): Long =
    SnapshotTable.commit(spark, table,
      Dedup.exactDedup(docs, textCol, idCol)
        .withColumn(HashCol, md5(col(textCol))), tag = tag)

  /** Land one crawl batch: batch-internal dedup, novelty anti-join on the
    * corpus's hash column, atomic tagged Append of the survivors. Returns
    * the corpus version the batch is visible at (the current version for a
    * replayed tag or an all-duplicate batch). */
  def refresh(spark: SparkSession, table: String, batch: DataFrame,
      textCol: String, idCol: String, tag: Option[String] = None): Long = {
    val current = SnapshotTable.latestVersion(table).getOrElse(
      throw new IllegalArgumentException(s"bootstrap $table first"))
    if (tag.exists(SnapshotTable.hasTag(table, _))) return current // replay
    val novel = Dedup.exactDedup(batch, textCol, idCol)
      .withColumn(HashCol, md5(col(textCol)))
      .join(SnapshotTable.read(spark, table).select(HashCol),
        Seq(HashCol), "left_anti")
      // hash first in the schema would shuffle the reader's column order;
      // keep the document columns leading, hash trailing (bootstrap shape)
      .select(batch.columns.map(col) :+ col(HashCol): _*)
    if (novel.isEmpty) current
    else SnapshotTable.commit(spark, table, novel,
      mode = SnapshotTable.Append, tag = tag)
  }
}
