package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** P17: incremental web-corpus intake — P16's RefinedWeb-style chain run
  * against a LIVE corpus instead of a one-shot batch: each crawl batch is
  * URL-deduped (in-batch and against every URL the corpus ever landed),
  * normalized (T26), quality-filtered (T22), content-deduped (in-batch and
  * against the corpus), and its survivors Append atomically. This is
  * what an always-on crawl pipeline actually runs: P14's incremental-
  * refresh cost model — touch |batch| texts plus two NARROW corpus
  * columns — with the full intake chain, not just exact dedup.
  *
  * The corpus table persists TWO hash columns: `url_hash` (md5 of the
  * canonical URL) next to P14's `content_hash` (md5 of the NORMALIZED
  * text). The URL scrub therefore costs a pruned scan of url_hash bytes
  * (~0.2% of the table at 100 TB) and kills refetches before any content
  * work — the reason crawl pipelines put the URL pass first. Content
  * novelty compares normalized-text hashes, so a recrawl that differs
  * only by mojibake/invisible bytes still collapses.
  *
  * Ordering contract (P16's, now incremental): URL first, normalize
  * second, quality third, content last — a document dropped by quality
  * NEVER lands, but its URL also never lands, so a future better copy at
  * the same URL still gets its chance; first-arrival-wins applies per
  * stage exactly as the batch chain's min-winner does within a batch and
  * the incumbent does across batches.
  *
  * Atomicity/replay: one tagged Append per batch via the commit protocol
  * (X13 discipline — a redelivered batch sees its tag and no-ops);
  * readers see old corpus or new, never half a batch. The streaming form
  * ([[graft.streaming.WebIntakeStream]]) is this function under
  * foreachBatch.
  */
object WebIntake {

  val UrlHashCol = "url_hash"
  val HashCol: String = IncrementalCorpus.HashCol

  /** The per-batch intake chain WITHOUT corpus scrubs: canonical-URL
    * min-winner (D15), T26 normalization (the stored text IS the
    * normalized text), T22 keep filter, in-batch content min-winner (D1).
    * Returns (idCol, urlCol canonical, textCol normalized, url_hash,
    * content_hash). */
  def prepareBatch(batch: DataFrame, urlCol: String, textCol: String,
      idCol: String, minWords: Int = 15): DataFrame = {
    val canon = batch.withColumn(urlCol, Urls.canonicalizeUrl(col(urlCol)))
    // url-less rows (null canon) skip URL dedup entirely — absence of the
    // key is not a shared key (see Urls.dedupByUrl)
    val withUrl = canon.filter(col(urlCol).isNotNull)
    val urlWinners = withUrl.groupBy(col(urlCol))
      .agg(min(col(idCol)).as(idCol)).select(idCol)
    val urlKept = withUrl.join(urlWinners, Seq(idCol), "left_semi")
      .unionByName(canon.filter(col(urlCol).isNull))
    // Caches-owned (batch-sized by contract): the normalized text feeds the
    // quality rules, the dedup AND the returned frame — without the barrier
    // the keep-filter's predicate pushdown inlines the whole NFC+regex
    // chain into every rule reference and evaluates it interpreted (the
    // rule HOFs are CodegenFallback), a measured ~10x blow-up.
    val norm = Caches.owned(urlKept.withColumn(textCol,
      TextAnalysis.normalizeText(col(textCol))))
    val quality = TextAnalysis.gopherRules(norm, idCol, textCol,
        minWords = minWords)
      .filter(col("keep")).select(idCol)
    Dedup.exactDedup(norm.join(quality, Seq(idCol), "left_semi"),
        textCol, idCol)
      .withColumn(UrlHashCol, md5(col(urlCol)))
      .withColumn(HashCol, md5(col(textCol)))
  }

  /** Create the corpus from the first crawl: the full intake chain, one
    * commit. */
  def bootstrap(spark: SparkSession, table: String, docs: DataFrame,
      urlCol: String, textCol: String, idCol: String, minWords: Int = 15,
      tag: Option[String] = None): Long =
    SnapshotTable.commit(spark, table,
      prepareBatch(docs, urlCol, textCol, idCol, minWords), tag = tag)

  /** Land one crawl batch: the intake chain plus the two narrow-column
    * corpus scrubs (url_hash BEFORE content work, content_hash after),
    * then one atomic tagged Append. Returns the corpus version the batch
    * is visible at (current version for a replayed tag or a fully-
    * duplicate batch). */
  def intake(spark: SparkSession, table: String, batch: DataFrame,
      urlCol: String, textCol: String, idCol: String, minWords: Int = 15,
      tag: Option[String] = None): Long = {
    val current = SnapshotTable.latestVersion(table).getOrElse(
      throw new IllegalArgumentException(s"bootstrap $table first"))
    if (tag.exists(SnapshotTable.hasTag(table, _))) return current // replay
    val corpus = SnapshotTable.read(spark, table)
    val canon = batch.withColumn(urlCol, Urls.canonicalizeUrl(col(urlCol)))
    // url-less rows skip both the in-batch URL dedup and the corpus
    // url_hash scrub (their url_hash is null, and a null key never
    // matches an anti-join anyway) — see Urls.dedupByUrl
    val withUrl = canon.filter(col(urlCol).isNotNull)
    val urlWinners = withUrl.groupBy(col(urlCol))
      .agg(min(col(idCol)).as(idCol)).select(idCol)
    val urlNovel = withUrl.join(urlWinners, Seq(idCol), "left_semi")
      .unionByName(canon.filter(col(urlCol).isNull))
      .withColumn(UrlHashCol, md5(col(urlCol)))
      .join(corpus.select(UrlHashCol), Seq(UrlHashCol), "left_anti")
    // persisted for the same reason as prepareBatch's norm, but released
    // HERE (intake completes its own actions), so a long-running X26
    // stream never accumulates cached batch frames across micro-batches
    val norm = urlNovel.withColumn(textCol,
        TextAnalysis.normalizeText(col(textCol)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val quality = TextAnalysis.gopherRules(norm, idCol, textCol,
          minWords = minWords)
        .filter(col("keep")).select(idCol)
      val novel = Dedup.exactDedup(norm.join(quality, Seq(idCol), "left_semi"),
          textCol, idCol)
        .withColumn(HashCol, md5(col(textCol)))
        .join(corpus.select(HashCol), Seq(HashCol), "left_anti")
        .select(batch.columns.map(col) :+ col(UrlHashCol) :+ col(HashCol): _*)
      // one materialization answers the emptiness check AND feeds the
      // write: `novel.isEmpty` + commit used to evaluate the scrub chain
      // twice (isEmpty's limit-1 still plans and runs the joins)
      val (mat, n) = org.apache.spark.sql.graft.ColumnBridge
        .localCheckpointCounted(novel)
      try {
        if (n == 0) current
        else SnapshotTable.commit(spark, table, mat,
          mode = SnapshotTable.Append, tag = tag)
      } finally org.apache.spark.sql.graft.ColumnBridge.unpersistCheckpoint(mat)
    } finally { norm.unpersist(false): Unit }
  }
}
