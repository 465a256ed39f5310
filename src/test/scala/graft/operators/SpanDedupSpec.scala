package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row

/** D11 line dedup and D12 exact-substring span dedup on hand-verified
  * corpora (the sf-scale generic derivation is the driver gate's job). */
class SpanDedupSpec extends SparkSpec {

  import spark.implicits._

  test("D11: keep-first line dedup across and within docs") {
    val docs = Seq(
      (1L, "a\nb\na"),        // intra-doc repeat of "a"
      (2L, "b\nc"),           // "b" already taken by doc 1
      (3L, " a \n\n d")       // trims to "a" (taken) and "d"; blank dropped
    ).toDF("doc_id", "text")
    val out = SpanDedup.lineDedup(docs, "text", "doc_id")
      .orderBy("doc_id").collect().toSeq
    out shouldBe Seq(
      Row(1L, "a\nb", 2L, 1L),
      Row(2L, "c", 1L, 1L),
      Row(3L, "d", 1L, 1L))
  }

  test("D11: a fully-deduplicated doc survives with empty text") {
    val docs = Seq((1L, "same"), (2L, "same")).toDF("doc_id", "text")
    val out = SpanDedup.lineDedup(docs, "text", "doc_id")
      .orderBy("doc_id").collect().toSeq
    out shouldBe Seq(Row(1L, "same", 1L, 0L), Row(2L, "", 0L, 1L))
  }

  test("D12: cross-doc duplicated chunk marks only the later occurrence") {
    val docs = Seq(
      (1L, "x1 x2 a b c d x3"),
      (2L, "y1 a b c d y2 y3")
    ).toDF("doc_id", "text")
    val spans = SpanDedup.duplicateSpans(docs, "text", "doc_id", minTokens = 3)
      .orderBy("doc_id", "span_start").collect().toSeq
    // windows "a b c"/"b c d" are first in doc 1 (pos 2, 3); doc 2's copies
    // (pos 1, 2) are redundant and merge into one span [1, 5)
    spans shouldBe Seq(Row(2L, 1L, 5L))
  }

  test("D12: intra-doc repetition merges into one maximal span, removal keeps one copy") {
    val docs = Seq((1L, "a b c a b c a b c")).toDF("doc_id", "text")
    val out = SpanDedup.substringDedup(docs, "text", "doc_id", minTokens = 3)
      .collect().toSeq
    // windows at 0,1,2 are first occurrences; 3..6 redundant -> span [3, 9)
    out shouldBe Seq(Row(1L, 1L, 6L, "a b c"))
  }

  test("D12: docs shorter than minTokens pass through untouched") {
    val docs = Seq((1L, "p q"), (2L, "p q")).toDF("doc_id", "text")
    val out = SpanDedup.substringDedup(docs, "text", "doc_id", minTokens = 3)
      .orderBy("doc_id").collect().toSeq
    out shouldBe Seq(Row(1L, 0L, 0L, "p q"), Row(2L, 0L, 0L, "p q"))
  }

  test("D12: after removal no cross-doc duplicated window remains (no-juxtaposition corpus)") {
    // spans sit at document tails here, so removal can't juxtapose tokens
    // into NEW duplicated windows — the cleaned corpus must be span-free
    val docs = Seq(
      (1L, "n1 n2 n3 n4 w1 w2 w3 w4 w5"),
      (2L, "m1 m2 m3 w1 w2 w3 w4 w5"),
      (3L, "k1 k2 k3 k4 k5 w1 w2 w3 w4 w5")
    ).toDF("doc_id", "text")
    val cleaned = SpanDedup.substringDedup(docs, "text", "doc_id", minTokens = 4)
      .select($"doc_id", $"clean_text".as("text"))
    SpanDedup.duplicateSpans(cleaned, "text", "doc_id", minTokens = 4)
      .count() shouldBe 0L
    Caches.releaseAll()
  }
}
