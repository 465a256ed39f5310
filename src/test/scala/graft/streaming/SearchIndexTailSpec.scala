package graft.streaming

import graft.SparkSpec
import graft.operators.{IncrementalCorpus, Search, SnapshotTable}
import org.apache.spark.sql.functions._

/** X25: index-follows-corpus — state scoring ≡ batch bm25 over the corpus
  * content, replays land nothing, non-insert-only spans fail loudly. */
class SearchIndexTailSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    "spark merges the vector corpus", "dedup keeps one copy per text",
    "a merge of spark plans", "vectors index the corpus",
    "plain prose about nothing", "dup dup dup spam line")

  // ids 2k and 2k+1 share a text (in-batch dup pairs); each k is novel
  private def doc(i: Long): (Long, String) =
    (i, texts((i / 2 % 6).toInt) + s" t${i / 2}")

  private def manifests(vs: Long*) =
    vs.map(v => s"""{"version":$v}""").toDF("value")

  test("tailed index scores ≡ batch bm25 over the corpus content (X25)") {
    val t = graft.Scratch.fresh("sidx_corpus")
    val idx = graft.Scratch.fresh("sidx_idx")
    IncrementalCorpus.bootstrap(spark, t, (0L until 40L).map(doc).toDF("id", "text"), "text", "id")
    IncrementalCorpus.refresh(spark, t,
      (40L until 80L).map(doc).toDF("id", "text"), "text", "id", tag = Some("c1"))
    for (v <- 1L to 2L)
      SearchIndexTail.applyBatch(spark, manifests(v), v, t, "text", "id", idx)
    val terms = Seq("spark", "dup", "corpus")
    val fromState = StreamingSearchIndex.search(spark, idx, "id", terms, k = 20)
      .as[(Long, Long, Long)].collect().toSet
    val batch = Search.bm25TopK(SnapshotTable.read(spark, t), "text", "id", terms, k = 20)
      .as[(Long, Long, Long)].collect().toSet
    fromState shouldBe batch
  }

  test("replayed spans land nothing; a non-insert-only span fails loudly (X25)") {
    val t = graft.Scratch.fresh("sidx_replay")
    val idx = graft.Scratch.fresh("sidx_replay_idx")
    IncrementalCorpus.bootstrap(spark, t, (0L until 30L).map(doc).toDF("id", "text"), "text", "id")
    SearchIndexTail.applyBatch(spark, manifests(1L), 1L, t, "text", "id", idx)
    val done = StreamingSearchIndex.Tables.map(n =>
      SnapshotTable.versions(s"$idx/$n"))
    SearchIndexTail.applyBatch(spark, manifests(1L), 99L, t, "text", "id", idx)
    StreamingSearchIndex.Tables.map(n =>
      SnapshotTable.versions(s"$idx/$n")) shouldBe done
    // mutate the corpus outside the append-only discipline (id 4 is a live
    // dedup winner — even ids win their pair): the tail must refuse the
    // span instead of serving an index missing the delete
    SnapshotTable.merge(spark, t,
      Seq((4L, "whatever", "x", "D")).toDF("id", "text", "content_hash", "op"),
      Seq("id"))
    an[IllegalArgumentException] should be thrownBy
      SearchIndexTail.applyBatch(spark, manifests(2L), 2L, t, "text", "id", idx)
  }
}
