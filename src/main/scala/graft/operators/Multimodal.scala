package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2.3 M1).
  *
  * Media travels as an opaque `binary` payload plus a typed metadata struct —
  * the schema a 100 TB image/audio corpus actually uses (payloads in parquet
  * binary columns or referenced object-store keys, metadata queryable without
  * touching bytes). Decode/feature-extraction runs per-partition over an
  * iterator so a real codec (JNI image lib, ffmpeg pipe) drops in without
  * changing the plan shape; the container has no media libs, so `FakeCodec`
  * is a clearly-marked deterministic stand-in — the Spark-side plumbing
  * (schema, batching, partition flow) is real and tested.
  */
object Multimodal {

  case class MediaMeta(modality: String, format: String, width: Int, height: Int, durationMs: Long)
  case class MediaRow(media_id: Long, meta: MediaMeta, payload: Array[Byte])
  case class MediaFeatures(
      media_id: Long, modality: String, n_bytes: Long, checksum: Long,
      histogram: Array[Long], thumbnail: Array[Byte])

  /** STUB — deterministic fake decode. A real deployment swaps this for the
    * actual codec; it runs inside `mapPartitions` so the swap is local.
    */
  object FakeCodec {
    def features(row: MediaRow): MediaFeatures = {
      val bytes = row.payload
      var checksum = 17L
      val hist = new Array[Long](16)
      var i = 0
      while (i < bytes.length) {
        checksum = checksum * 31 + (bytes(i) & 0xff)
        hist((bytes(i) & 0xff) % 16) += 1
        i += 1
      }
      MediaFeatures(row.media_id, row.meta.modality, bytes.length.toLong, checksum,
        hist, bytes.take(16))
    }
  }

  /** Wrap a text corpus as a fake media corpus: payload = utf-8 bytes,
    * metadata derived deterministically. Lets the plumbing be exercised on
    * the `documents` testdata without real media files.
    */
  def asMediaCorpus(documents: DataFrame, idCol: String, textCol: String): DataFrame =
    documents.select(
      col(idCol).cast("long").as("media_id"),
      struct(
        when(col(idCol) % 3 === 0, "image").when(col(idCol) % 3 === 1, "audio")
          .otherwise("video").as("modality"),
        lit("fake/raw").as("format"),
        (pmod(col(idCol), lit(64)) * 16 + 16).cast("int").as("width"),
        (pmod(col(idCol), lit(48)) * 16 + 16).cast("int").as("height"),
        (length(col(textCol)) * 40L).cast("long").as("durationMs")).as("meta"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** Per-partition batched decode/feature-extract — the `mapInPandas`-shaped
    * stage: iterator in, iterator out, no per-row overhead, executor-local.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions(rows => rows.map(FakeCodec.features))
  }

  /** Metadata-only pruning path: query width/height/duration without reading
    * payload bytes (column pruning drops `payload` at the scan). */
  def filterByMeta(media: DataFrame, modality: String, minWidth: Int): DataFrame =
    media.filter(col("meta.modality") === modality && col("meta.width") >= minWidth)
      .select("media_id", "meta.width", "meta.height")

  case class Thumbnail(media_id: Long, width: Int, height: Int, pixels: Array[Byte])

  /** Resize-to-thumbnail stage — same per-partition batched shape as
    * `extractFeatures`. STUB decode: a real image lib replaces
    * `FakeCodec`-style byte sampling with actual pixel scaling; the
    * partition flow, output schema and size math are the real part.
    * Output is `targetW×targetH` bytes sampled evenly from the payload
    * (deterministic), so downstream schema/partitioning is exercised with
    * honest data volumes. */
  def resizeThumbnails(spark: SparkSession, media: DataFrame,
      targetW: Int = 8, targetH: Int = 8): Dataset[Thumbnail] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions(rows => rows.map { r =>
      val n   = targetW * targetH
      val src = r.payload
      val px  = new Array[Byte](n)
      var i = 0
      while (i < n) {
        px(i) = if (src.isEmpty) 0 else src(((i.toLong * src.length) / n).toInt)
        i += 1
      }
      Thumbnail(r.media_id, targetW, targetH, px)
    })
  }

  /** M5: interleaved multimodal sequence packing — the MMC4/OBELICS prep
    * step: fold image placeholders INTO the packed token stream so
    * vision-language pretraining sees `[image tokens][caption/body text]`
    * inside fixed-length sequences, instead of text-only packing (T12)
    * that loses the images.
    *
    * Each doc contributes an item stream: item 0 = its attached image (if
    * `media` carries a row with `media_id == doc id`; `meta.width/height`
    * required), item 1 = its text. An image costs what a ViT actually
    * spends on it — `ceil(w/patch) · ceil(h/patch)` patch tokens (integer
    * `div` arithmetic, engine-exact) — text costs its T3 whitespace
    * tokens. Packing is T12's machinery at ITEM granularity with one added
    * ordering key: (md5(id), id, item_idx), so a doc's image and text stay
    * adjacent and in order while docs land in deterministic md5 order.
    * Output per item: (idCol, item_idx, kind, n_tokens, shard, seq_id,
    * seq_off).
    *
    * Scale shape: the union is two projections; the only shuffle is the
    * per-shard cumulative-sum window, whose partition size is bounded by
    * `shards` exactly as T12 argues — no global sort, no funnel. Payload
    * bytes are never touched: the image's token cost reads metadata only,
    * so column pruning drops the binary column at the scan. */
  def interleavePack(docs: DataFrame, media: DataFrame, idCol: String,
      textCol: String, seqLen: Int, shards: Int = 1024,
      patch: Int = 14): DataFrame = {
    require(patch > 0, s"need patch > 0, got $patch")
    val p1 = patch - 1
    val imgItems = media.select(
      col("media_id").cast("long").as("__id"),
      lit(0).as("item_idx"), lit("image").as("kind"),
      (expr(s"(meta.width + $p1) div $patch") *
        expr(s"(meta.height + $p1) div $patch")).cast("long").as("n_tokens"))
    val textItems = docs.select(
      col(idCol).cast("long").as("__id"),
      lit(1).as("item_idx"), lit("text").as("kind"),
      TextAnalysis.wsTokens(col(textCol)).cast("long").as("n_tokens"))
    packItems(imgItems.unionByName(textItems), idCol, seqLen, shards)
  }

  /** M6: interleavePack for MULTI-image documents — MMC4's real shape,
    * where a page carries several images at positions in the text flow.
    * `media` rows reference their doc (`docRefCol`) and carry an explicit
    * 0-based `posCol` (distinct per doc, < 2^30 — the caller's layout
    * contract; no per-doc window is spent re-ranking what the extractor
    * already knows). Images pack at their positions in order, the doc's
    * text packs LAST (item_idx = Int.MaxValue), each image costed at its
    * own ViT patch count from its own metadata. Same per-shard prefix-sum
    * machinery, same output shape; a doc's whole item run stays contiguous
    * under the (md5(id), id, item_idx) order. */
  def interleavePackMulti(docs: DataFrame, media: DataFrame, idCol: String,
      textCol: String, docRefCol: String, posCol: String, seqLen: Int,
      shards: Int = 1024, patch: Int = 14): DataFrame = {
    require(patch > 0, s"need patch > 0, got $patch")
    val p1 = patch - 1
    val imgItems = media.select(
      col(docRefCol).cast("long").as("__id"),
      col(posCol).cast("int").as("item_idx"), lit("image").as("kind"),
      (expr(s"(meta.width + $p1) div $patch") *
        expr(s"(meta.height + $p1) div $patch")).cast("long").as("n_tokens"))
    val textItems = docs.select(
      col(idCol).cast("long").as("__id"),
      lit(Int.MaxValue).as("item_idx"), lit("text").as("kind"),
      TextAnalysis.wsTokens(col(textCol)).cast("long").as("n_tokens"))
    packItems(imgItems.unionByName(textItems), idCol, seqLen, shards)
  }

  /** Shared T12-at-item-granularity packing: deterministic (md5(id), id,
    * item_idx) order, per-shard cumulative offsets, integer seq cuts. */
  private def packItems(items: DataFrame, idCol: String, seqLen: Int,
      shards: Int): DataFrame = {
    require(seqLen > 0 && shards > 0,
      s"need seqLen/shards > 0, got $seqLen/$shards")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("__u"), col("__id"), col("item_idx"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    items
      .withColumn("shard", pmod(Sampling.hashUnit(col("__id")), lit(shards.toLong)))
      .withColumn("__u", md5(col("__id").cast("string")))
      .withColumn("__off", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("seq_id", expr(s"__off div $seqLen"))
      .withColumn("seq_off", col("__off") - col("seq_id") * seqLen)
      .select(col("__id").as(idCol), col("item_idx"), col("kind"),
        col("n_tokens"), col("shard"), col("seq_id"), col("seq_off"))
  }

  /** M4: 16-bit perceptual hash over the codec's byte histogram — bit i
    * set iff bucket i holds at least its even share (hist[i]·16 ≥ n) —
    * the aHash shape on the stand-in feature (a real pHash — DCT over
    * decoded pixels — drops into the codec stage without changing
    * anything downstream). Pure integer comparisons: engine-exact. */
  def phash16(hist: Array[Long], nBytes: Long): Long = {
    var acc = 0L
    var i = 0
    while (i < 16) { if (hist(i) * 16 >= nBytes) acc |= 1L << i; i += 1 }
    acc
  }

  /** M4: perceptual media dedup — canonical (min media_id) per EXACT
    * phash group: the "perceptually identical" collapse (re-encoded /
    * metadata-stripped copies of the same content land on the same
    * perceptual hash; that is the hash's entire design goal). Features
    * come through the per-partition codec seam; the group-min resolves
    * as one hash aggregation + a phash join — no window sort. On a
    * homogeneous corpus exact-phash groups are the honest grain: a
    * hamming-radius merge chains everything into one cluster (near-dup
    * RADIUS search stays [[nearDupPairs]], spec-gated where it is
    * meaningful). */
  def perceptualDedup(spark: SparkSession, media: DataFrame): DataFrame = {
    // Caches-owned: the phash frame is two longs per row but feeds both
    // the group-min and the re-join — unowned, the codec stage (the
    // expensive decode at scale) runs twice (review-caught)
    val ph = phashFrame(spark, media)
    val canon = ph.groupBy("phash").agg(min(col("media_id")).as("canonical_id"))
    ph.join(canon, "phash").select("media_id", "canonical_id", "phash")
  }

  private def phashFrame(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    Caches.owned(extractFeatures(spark, media)
      .map(f => (f.media_id, phash16(f.histogram, f.n_bytes)))
      .toDF("media_id", "phash"))
  }

  /** M4: near-dup pairs at Hamming ≤ 1 over the 16-bit phash, banded
    * LSH-style into the two 8-bit halves — one differing bit falls in
    * exactly one band, so the OTHER band matches and the candidate is
    * never lost (d+1-band pigeonhole, here d = 1). Two equi-joins + a
    * dedup instead of any all-pairs scan; the exact Hamming test is the
    * residual. Returns (`id_a`, `id_b`, `hamming`), id_a < id_b. */
  def nearDupPairs(spark: SparkSession, media: DataFrame): DataFrame = {
    // owned for the same reason as perceptualDedup — two bands × two join
    // sides would otherwise re-decode every payload four times
    val ph = phashFrame(spark, media)
    def keyed(band: String) = {
      val key = if (band == "hi") expr("phash div 256") else col("phash") % 256L
      ph.select(col("media_id"), col("phash"), key.as("band_key"))
    }
    val cand = Seq("hi", "lo").map { b =>
      val l = keyed(b).select(col("media_id").as("id_a"), col("phash").as("pa"),
        col("band_key"))
      val r = keyed(b).select(col("media_id").as("id_b"), col("phash").as("pb"),
        col("band_key"))
      l.join(r, "band_key").filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b", "pa", "pb")
    }.reduce(_ unionByName _).dropDuplicates("id_a", "id_b")
    cand.withColumn("hamming", bit_count(col("pa").bitwiseXOR(col("pb"))).cast("long"))
      .filter(col("hamming") <= 1)
      .select("id_a", "id_b", "hamming")
  }

  case class Frame(media_id: Long, frame_no: Int, offset_ms: Long, payload: Array[Byte])

  /** Frame-sampling stage for video/audio rows: emit one row per sampled
    * frame at `everyMs` spacing over the metadata duration — a flatMap
    * (1→N) per-partition stage, the shape a real decoder (ffmpeg pipe)
    * drops into. STUB decode: each frame's payload is the byte window at
    * the proportional offset. */
  def sampleFrames(spark: SparkSession, media: DataFrame,
      everyMs: Long = 1000L, frameBytes: Int = 32): Dataset[Frame] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions(rows => rows.flatMap { r =>
      val dur = math.max(0L, r.meta.durationMs)
      val n   = (dur / math.max(1L, everyMs)).toInt + 1
      (0 until n).iterator.map { f =>
        val offMs = f * everyMs
        val start = if (dur == 0) 0 else ((offMs.toDouble / math.max(1L, dur)) * r.payload.length).toInt
        val end   = math.min(r.payload.length, start + frameBytes)
        Frame(r.media_id, f, offMs, java.util.Arrays.copyOfRange(r.payload, math.min(start, end), end))
      }
    })
  }
}
