package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** M4: perceptual media dedup — phash unit behavior, identical payloads
  * collapse, banded hamming-1 pairs ≡ brute force (the d+1-band
  * pigeonhole is lossless), partitioning independence. */
class PerceptualDedupSpec extends SparkSpec {
  import spark.implicits._

  private def phashOf(text: String): Long = {
    val bs = text.getBytes("UTF-8")
    val hist = new Array[Long](16)
    bs.foreach(b => hist((b & 0xff) % 16) += 1)
    Multimodal.phash16(hist, bs.length.toLong)
  }

  private def mediaOf(rows: Seq[(Long, String)]) =
    Multimodal.asMediaCorpus(rows.toDF("doc_id", "text"), "doc_id", "text")

  test("phash16: concentrated histogram sets one bit, uniform sets all (M4)") {
    val one = new Array[Long](16); one(5) = 100
    Multimodal.phash16(one, 100) shouldBe (1L << 5)
    val uni = Array.fill(16)(4L)
    Multimodal.phash16(uni, 64) shouldBe 0xFFFF
    Multimodal.phash16(new Array[Long](16), 0) shouldBe 0xFFFF // vacuous ≥
  }

  test("byte-identical payloads collapse to the min id (M4)") {
    val rows = Seq((10L, "alpha beta"), (20L, "alpha beta"), (30L, "zzzz"))
    val got = Multimodal.perceptualDedup(spark, mediaOf(rows))
      .select("media_id", "canonical_id")
      .as[(Long, Long)].collect().toMap
    got(20L) shouldBe 10L
    got(10L) shouldBe 10L
    // 30 groups with 10/20 only if its phash happens to match — verify
    // against the driver-side phash
    if (phashOf("zzzz") == phashOf("alpha beta")) got(30L) shouldBe 10L
    else got(30L) shouldBe 30L
  }

  test("banded hamming-1 pairs equal brute force over random media (M4)") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abcdefghijklmnopqrstuvwxyz0123456789 "
    val rows = (0 until 300).map { i =>
      (i.toLong, Seq.fill(3 + rnd.nextInt(60))(
        alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    val ph = rows.map { case (id, t) => id -> phashOf(t) }
    val want = (for {
      (a, pa) <- ph; (b, pb) <- ph if a < b
      h = java.lang.Long.bitCount(pa ^ pb) if h <= 1
    } yield (a, b, h.toLong)).sorted
    val got = Multimodal.nearDupPairs(spark, mediaOf(rows))
      .as[(Long, Long, Long)].collect().toSeq.sorted
    got shouldBe want
    want.size should be > 0 // the fixture actually exercises the path
  }

  test("results are independent of input partitioning (M4)") {
    val rows = (0 until 200).map(i => (i.toLong, s"text ${i % 17} payload"))
    val base = Multimodal.perceptualDedup(spark, mediaOf(rows))
      .as[(Long, Long, Long)].collect().toSeq.sorted
    val repart = Multimodal.perceptualDedup(spark, mediaOf(rows).repartition(13))
      .as[(Long, Long, Long)].collect().toSeq.sorted
    repart shouldBe base
  }
}
