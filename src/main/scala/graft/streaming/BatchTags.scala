package graft.streaming

/** Idempotency-tag namespacing for foreachBatch sinks that publish through
  * snapshot-table commit tags.
  *
  * The hazard: Structured Streaming batch ids are scoped to ONE
  * checkpoint. Two queries maintaining the same table — or one query
  * restarted with a FRESH checkpoint, whose batch ids restart at 0 —
  * produce colliding bare-`batchId` tags, and the replay check then
  * silently skips legitimate batches (data loss that looks like
  * idempotency). The checkpoint path is exactly the identity that matches
  * batch-id semantics: same checkpoint ⇒ ids continue and replay dedup
  * must hold; fresh checkpoint ⇒ a new id space whose tags must not
  * collide with any earlier query's.
  *
  * Every streaming module's `start()` derives a namespace from its
  * checkpoint location and threads it into `applyBatch`; direct
  * `applyBatch` callers (specs, one-shot backfills) may pass `""` and get
  * the legacy un-namespaced tags — consistent within their own single
  * id space. */
object BatchTags {

  /** Stable 8-hex-digit namespace for one streaming query. */
  def namespace(checkpointDir: String): String = {
    val p = java.nio.file.Paths.get(checkpointDir)
      .toAbsolutePath.normalize().toString
    f"${scala.util.hashing.MurmurHash3.stringHash(p)}%08x"
  }

  /** `prefix-batchId` under `namespace` (empty namespace ⇒ legacy form). */
  def tag(namespace: String, prefixed: String): String =
    if (namespace.isEmpty) prefixed else s"$namespace#$prefixed"
}
