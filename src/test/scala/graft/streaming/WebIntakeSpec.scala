package graft.streaming

import graft.SparkSpec
import graft.operators.{SnapshotTable, WebIntake}
import org.apache.spark.sql.functions._

/** X26/P17: streamed crawl shards through the FULL intake chain - URL
  * scrub before content work, normalization-aware content scrub, quality
  * gate - with replay no-ops and per-stage kill proofs. */
class WebIntakeSpec extends SparkSpec {
  import spark.implicits._

  // body long enough to clear minWords=15 with >= 2 distinct stopwords
  private def body(t: Long): String =
    s"the quick brown fox and the lazy dog know that document number $t " +
      "carries enough ordinary running words to clear every quality rule"

  private def frame(rows: Seq[(Long, String, String)]) =
    rows.toDF("id", "url", "text")

  test("intake batches: url/content/quality kills + replay no-op (X26)") {
    val t = graft.Scratch.fresh("x26spec_corpus")
    val b0 = (0L until 20L).map(i =>
      (i, s"https://example.com/a/$i", body(i)))
    WebIntake.bootstrap(spark, t, frame(b0), "url", "text", "id")
    SnapshotTable.versions(t) shouldBe Seq(1L)

    // batch 1: refetch of url 3 (case + tracker), recrawl of body 7 with
    // a ZWSP (content-dup only after normalization), one spam doc, one
    // novel doc, and an in-batch url dup pair (min id wins)
    val b1 = Seq(
      (100L, "HTTPS://WWW.example.com/a/3?utm_campaign=z", body(100)),
      (101L, "https://example.com/b/101", body(7) + "\u200B"),
      (102L, "https://example.com/b/102",
        body(102) + " #### #### #### #### #### ####"),
      (103L, "https://example.com/b/103", body(103)),
      (104L, "https://example.com/b/SHARED", body(104)),
      (105L, "https://example.com/b/SHARED/", body(105)))
    WebIntakeStream.applyBatch(spark, frame(b1), 1L, t,
      "url", "text", "id")
    val ids = SnapshotTable.read(spark, t).select("id")
      .as[Long].collect().toSet
    ids shouldBe ((0L until 20L).toSet + 103L + 104L)

    // replayed batch id lands nothing even with novel content
    WebIntakeStream.applyBatch(spark,
      frame(Seq((999L, "https://example.com/z/999", body(999)))), 1L, t,
      "url", "text", "id")
    SnapshotTable.read(spark, t).count() shouldBe 22L

    // all-duplicate batch creates no version
    val vBefore = SnapshotTable.versions(t)
    WebIntakeStream.applyBatch(spark,
      frame(Seq((500L, "https://example.com/a/5?utm_source=x", body(500)))),
      2L, t, "url", "text", "id")
    SnapshotTable.versions(t) shouldBe vBefore
  }

  test("corpus text is stored NORMALIZED; url column is canonical (X26)") {
    val t = graft.Scratch.fresh("x26spec_norm")
    WebIntake.bootstrap(spark, t,
      frame(Seq((1L, "HTTPS://example.com:443/x/", body(1) + "\r\nCafe\u0301"))),
      "url", "text", "id")
    val row = SnapshotTable.read(spark, t).select("url", "text")
      .as[(String, String)].collect().head
    row._1 shouldBe "https://example.com/x"
    row._2 shouldBe body(1) + "\nCaf\u00E9"
  }

  test("start() refuses an un-bootstrapped corpus (X26)") {
    an[IllegalArgumentException] should be thrownBy
      WebIntakeStream.start(spark, graft.Scratch.fresh("x26spec_in"),
        frame(Seq((1L, "https://e.com/1", body(1)))).schema, "url", "text",
        "id", graft.Scratch.fresh("x26spec_none"),
        graft.Scratch.fresh("x26spec_ckpt"))
  }

  test("url-less docs skip URL dedup but face quality + content dedup (X26)") {
    val t = graft.Scratch.fresh("x26spec_nullurl")
    val nul = null.asInstanceOf[String]
    WebIntake.bootstrap(spark, t, frame(Seq(
      (0L, "https://example.com/a/0", body(0)),
      (1L, nul, body(1)),
      (2L, nul, body(2)),
      (3L, nul, body(1)))), "url", "text", "id")
    // both url-less originals survive; the url-less content-dup (3) loses
    SnapshotTable.read(spark, t).select("id").as[Long].collect().toSet shouldBe
      Set(0L, 1L, 2L)
    // a later url-less batch still content-scrubs against the corpus
    WebIntakeStream.applyBatch(spark,
      frame(Seq((10L, nul, body(2)), (11L, nul, body(99)))), 7L, t,
      "url", "text", "id")
    SnapshotTable.read(spark, t).select("id").as[Long].collect().toSet shouldBe
      Set(0L, 1L, 2L, 11L)
  }
}
