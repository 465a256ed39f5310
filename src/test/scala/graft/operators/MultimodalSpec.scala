package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "tiny image payload"),
    (1L, "somewhat longer audio-ish payload with more bytes"),
    (2L, "video payload content here")
  ).toDF("doc_id", "text")

  test("media corpus schema: binary payload + typed metadata (M1)") {
    val media = Multimodal.asMediaCorpus(docs, "doc_id", "text")
    media.schema("payload").dataType.typeName shouldBe "binary"
    val metas = media.select("media_id", "meta.modality", "meta.durationMs").collect()
    metas.map(r => r.getLong(0) -> r.getString(1)).toMap shouldBe
      Map(0L -> "image", 1L -> "audio", 2L -> "video")
    // duration derives from payload length deterministically
    metas.find(_.getLong(0) == 0L).get.getLong(2) shouldBe "tiny image payload".length * 40L
  }

  test("feature extraction runs per-partition and is deterministic (M1)") {
    val media = Multimodal.asMediaCorpus(docs, "doc_id", "text").repartition(3)
    val f1 = Multimodal.extractFeatures(spark, media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(spark, media).collect().sortBy(_.media_id)
    f1.map(_.checksum).toSeq shouldBe f2.map(_.checksum).toSeq
    f1.foreach { f =>
      f.n_bytes should be > 0L
      f.histogram.sum shouldBe f.n_bytes
      f.thumbnail.length should be <= 16
    }
  }

  test("thumbnail resize: fixed-size deterministic output per row (M1)") {
    val media = Multimodal.asMediaCorpus(docs, "doc_id", "text").repartition(2)
    val thumbs = Multimodal.resizeThumbnails(spark, media, targetW = 4, targetH = 4)
      .collect().sortBy(_.media_id)
    thumbs.length shouldBe 3
    thumbs.foreach { t =>
      t.width shouldBe 4
      t.height shouldBe 4
      t.pixels.length shouldBe 16
    }
    val again = Multimodal.resizeThumbnails(spark, media, 4, 4).collect().sortBy(_.media_id)
    thumbs.map(_.pixels.toSeq).toSeq shouldBe again.map(_.pixels.toSeq).toSeq
  }

  test("frame sampling: one row per everyMs over the metadata duration (M1)") {
    val media  = Multimodal.asMediaCorpus(docs, "doc_id", "text")
    val frames = Multimodal.sampleFrames(spark, media, everyMs = 200L, frameBytes = 8)
      .collect().groupBy(_.media_id)
    val durations = media.select("media_id", "meta.durationMs").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((id, fs) <- frames) {
      fs.length shouldBe (durations(id) / 200L).toInt + 1
      fs.map(_.frame_no).sorted.toSeq shouldBe (0 until fs.length)
      fs.foreach(_.payload.length should be <= 8)
    }
  }

  test("metadata-only filter prunes the payload column from the scan (M1)") {
    val media = Multimodal.asMediaCorpus(docs, "doc_id", "text")
    val plan = Multimodal.filterByMeta(media, "image", 0).queryExecution.executedPlan.toString
    // payload must not appear in the final projected plan output
    Multimodal.filterByMeta(media, "image", 0).columns shouldBe Array("media_id", "width", "height")
  }

  test("interleaved packing: image rides directly ahead of its doc's text (M5)") {
    val many = spark.range(0, 40).selectExpr("id AS doc_id",
      "concat('word ', repeat('tok ', CAST(id % 7 AS INT))) AS text")
    val media = Multimodal.asMediaCorpus(many, "doc_id", "text")
      .filter(col("meta.modality") === "image")
    val packed = Multimodal.interleavePack(many, media, "doc_id", "text",
      seqLen = 16, shards = 2)
    val rows = packed.collect().map(r => (r.getLong(0), r.getInt(1),
      r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    // every mod-3 doc has exactly one image item, every doc one text item
    rows.count(_._3 == "image") shouldBe 14
    rows.count(_._3 == "text") shouldBe 40
    // adjacency: within a doc, text starts exactly where the image ended
    val byDoc = rows.groupBy(_._1)
    for ((id, items) <- byDoc if items.length == 2) {
      val img = items.find(_._3 == "image").get
      val txt = items.find(_._3 == "text").get
      img._5 shouldBe txt._5 // same shard
      val imgGlobal = img._6 * 16 + img._7
      val txtGlobal = txt._6 * 16 + txt._7
      txtGlobal shouldBe (imgGlobal + img._4)
      // patch-token cost matches ceil(w/14)*ceil(h/14) of the meta
      val w = (id % 64) * 16 + 16; val h = (id % 48) * 16 + 16
      img._4 shouldBe ((w + 13) / 14) * ((h + 13) / 14)
    }
    // determinism under different partitioning
    val again = Multimodal.interleavePack(many.repartition(7), media.repartition(3),
      "doc_id", "text", seqLen = 16, shards = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    again.sortBy(t => (t._1, t._2)).toSeq shouldBe rows.sortBy(t => (t._1, t._2)).toSeq
  }

  test("interleavePack with no media degenerates to t12 text packing (M5)") {
    val many = spark.range(0, 30).selectExpr("id AS doc_id",
      "concat('a b c ', repeat('d ', CAST(id % 5 AS INT))) AS text")
    val none = Multimodal.asMediaCorpus(many, "doc_id", "text")
      .filter(col("media_id") < 0)
    val viaM5 = Multimodal.interleavePack(many, none, "doc_id", "text",
        seqLen = 32, shards = 4)
      .select("doc_id", "shard", "seq_id", "seq_off")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val viaT12 = TextAnalysis.packSequences(
        many.select(col("doc_id"), TextAnalysis.wsTokens(col("text")).as("toks")),
        "doc_id", "toks", seqLen = 32, shards = 4)
      .select("doc_id", "shard", "seq_id", "seq_off")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    viaM5.sortBy(_._1).toSeq shouldBe viaT12.sortBy(_._1).toSeq
  }

  test("multi-image interleaving: images chain in position order, text last (M6)") {
    val many = spark.range(0, 36).selectExpr("id AS doc_id",
      "concat('w ', repeat('t ', CAST(id % 5 AS INT))) AS text")
    def img(mod: Long, pos: Int, wm: Long, hm: Long) =
      many.filter(col("doc_id") % mod === 0)
        .select(col("doc_id").as("doc_ref"), lit(pos).as("pos"), struct(
          (pmod(col("doc_id"), lit(wm)) * 16 + 16).cast("int").as("width"),
          (pmod(col("doc_id"), lit(hm)) * 16 + 16).cast("int").as("height"))
          .as("meta"))
    val media = img(3, 0, 64, 48).unionByName(img(6, 1, 32, 24))
    val rows = Multimodal.interleavePackMulti(many, media, "doc_id", "text",
        "doc_ref", "pos", seqLen = 16, shards = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    rows.count(_._3 == "image") shouldBe (12 + 6)
    rows.count(_._3 == "text") shouldBe 36
    // per doc: items contiguous in the global stream, position order kept
    for ((_, items) <- rows.groupBy(_._1)) {
      val sorted = items.sortBy(_._2)
      sorted.last._3 shouldBe "text"
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          a._5 shouldBe b._5 // same shard
          (b._6 * 16 + b._7) shouldBe (a._6 * 16 + a._7 + a._4)
        case _ =>
      }
    }
  }

  test("single-image multi packing ≡ interleavePack (M6/M5)") {
    val many = spark.range(0, 30).selectExpr("id AS doc_id",
      "concat('a b ', repeat('c ', CAST(id % 4 AS INT))) AS text")
    val mediaM5 = Multimodal.asMediaCorpus(many, "doc_id", "text")
      .filter(col("meta.modality") === "image")
    val mediaM6 = mediaM5.select(col("media_id").as("doc_ref"),
      lit(0).as("pos"), col("meta"))
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "kind", "n_tokens", "shard", "seq_id", "seq_off")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).sortBy(t => (t._1, t._2))
    key(Multimodal.interleavePackMulti(many, mediaM6, "doc_id", "text",
      "doc_ref", "pos", seqLen = 32, shards = 4)).toSeq shouldBe
      key(Multimodal.interleavePack(many, mediaM5, "doc_id", "text",
        seqLen = 32, shards = 4)).toSeq
  }
}
