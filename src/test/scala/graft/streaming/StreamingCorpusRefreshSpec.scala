package graft.streaming

import graft.SparkSpec
import graft.operators.{IncrementalCorpus, SnapshotTable}
import org.apache.spark.sql.functions._

/** X23: streamed crawl shards ≡ the batch refresh chain, replayed batch
  * ids land nothing, duplicate-only shards create no version. */
class StreamingCorpusRefreshSpec extends SparkSpec {
  import spark.implicits._

  private def text(t: Long): String = s"crawl doc body $t"
  private def frame(pairs: Seq[(Long, Long)]) =
    pairs.map { case (id, ti) => (id, text(ti)) }.toDF("id", "text")

  test("shard drain ≡ batch chain; replays and dup-only shards land nothing (X23)") {
    val t = graft.Scratch.fresh("x23spec_corpus")
    IncrementalCorpus.bootstrap(spark, t,
      frame((0L until 50L).map(i => (i, i))), "text", "id")
    // batch 0: novel 50..79 + an in-batch dup copy of text 60
    val b0 = (50L until 80L).map(i => (i, i)) :+ ((980L, 60L))
    // batch 1: pure duplicates of the corpus
    val b1 = (100L until 130L).map(i => (i, i - 100))
    // batch 2: novel again
    val b2 = (200L until 220L).map(i => (i, i - 120))
    StreamingCorpusRefresh.applyBatch(spark, frame(b0), 0L, t, "text", "id")
    StreamingCorpusRefresh.applyBatch(spark, frame(b1), 1L, t, "text", "id")
    StreamingCorpusRefresh.applyBatch(spark, frame(b2), 2L, t, "text", "id")
    // b1 was all-dup: only bootstrap + b0 + b2 versions exist
    SnapshotTable.versions(t) shouldBe Seq(1L, 2L, 3L)
    val got = SnapshotTable.read(spark, t).select("id", "text")
      .as[(Long, String)].collect().toSet
    val expect = ((0L until 80L).map(i => (i, text(i))) ++
      (200L until 220L).map(i => (i, text(i - 120)))).toSet
    got shouldBe expect
    // replay of batch 0 with a different payload: tag no-ops it
    StreamingCorpusRefresh.applyBatch(spark,
      frame(Seq((999L, 999L))), 0L, t, "text", "id")
    SnapshotTable.versions(t) shouldBe Seq(1L, 2L, 3L)
    SnapshotTable.read(spark, t).count() shouldBe expect.size.toLong
  }

  test("start() refuses an un-bootstrapped corpus (X23)") {
    an[IllegalArgumentException] should be thrownBy
      StreamingCorpusRefresh.start(spark, graft.Scratch.fresh("x23spec_in"),
        frame(Seq((1L, 1L))).schema, "text", "id",
        graft.Scratch.fresh("x23spec_none"), graft.Scratch.fresh("x23spec_ckpt"))
  }
}
