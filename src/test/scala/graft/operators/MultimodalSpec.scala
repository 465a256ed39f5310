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
}
