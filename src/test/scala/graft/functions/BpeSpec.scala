package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** T16: native merge-table BPE vs an independent reference implementation
  * (replace-all-occurrences-per-chosen-pair, the classic formulation) and
  * fixed tokenizations implied by the checked-in table. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Reference: classic BPE — pick the lowest-rank pair PRESENT, replace
    * ALL its non-overlapping occurrences left-to-right, repeat. The kernel
    * merges one leftmost occurrence per step; for a fixed chosen pair the
    * two converge identically (the chosen pair stays lowest-rank until
    * exhausted), so outputs must agree everywhere. */
  private def referenceCount(text: String): Long = {
    val ranks = Bpe.merges.zipWithIndex.map { case ((a, b), r) => (a, b) -> r }.toMap
    def word(w: String): Int = {
      var toks = w.map(_.toString).toVector
      var done = false
      while (!done && toks.size > 1) {
        val present = toks.zip(toks.tail).flatMap(p => ranks.get(p).map(p -> _))
        if (present.isEmpty) done = true
        else {
          val (pa, pb) = present.minBy(_._2)._1
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < toks.size) {
            if (i < toks.size - 1 && toks(i) == pa && toks(i + 1) == pb) {
              out += pa + pb; i += 2
            } else { out += toks(i); i += 1 }
          }
          toks = out.result()
        }
      }
      toks.size
    }
    val lower = text.toLowerCase(java.util.Locale.ROOT)
    "[a-z]+|[0-9]+|[^a-z0-9\\s]".r.findAllIn(lower).map(word).map(_.toLong).sum
  }

  test("native BPE count equals the classic reference on random text (T16)") {
    val rng = new scala.util.Random(11)
    val vocab = Seq("table", "scan", "batch", "customer", "column", "filter",
      "small", "slow", "join", "hash", "row", "data", "the", "spark", "part",
      "Zebra", "12345", "x!y?", "merge-table", "a", "")
    val texts = Seq.fill(200)(
      Seq.fill(1 + rng.nextInt(20))(vocab(rng.nextInt(vocab.size))).mkString(" "))
    val out = texts.toDF("text")
      .select(Bpe.tokenCount(col("text")).as("n")).as[Long].collect()
    out.toSeq shouldBe texts.map(referenceCount)
  }

  test("checked-in table tokenizes trained words to single tokens") {
    val out = Seq("batch", "customer", "column", "small", "the", "data")
      .toDF("text").select(Bpe.tokenCount(col("text")).as("n")).as[Long].collect()
    // at 8k merges every common corpus word fully merges; an out-of-corpus
    // word still splits
    out.toSeq shouldBe Seq(1L, 1L, 1L, 1L, 1L, 1L)
    val oov = Seq("zyxwvu").toDF("text")
      .select(Bpe.tokenCount(col("text")).as("n")).as[Long].collect()
    oov.head should be > 1L
  }

  test("merge table is realistic-vocab scale and the rank map stays off the plan (T16)") {
    Bpe.merges.length should be >= 8000
    // the table rides as a codegen reference object: plan SIZE must not
    // scale with table size (the S5-codebook Janino lesson) — the canonical
    // string of the expression stays small
    val e = graft.functions.BpeTokenCount(
      org.apache.spark.sql.graft.ColumnBridge.expression(col("text")), Bpe.merges)
    e.toString.length should be < 100000
  }

  test("merge loop is heap-driven, not rescan-quadratic, on long pre-tokens (T16 perf)") {
    // a digit-heavy table fully merges long digit runs; per-word cost must
    // be O(L log L). 200 distinct 2000-char runs (memoization can't help —
    // all distinct) complete in well under the rescan formulation's time
    // (O(L²) ≈ 4M pair scans × 200 words); the generous bound only catches
    // a complexity regression, not host jitter
    val rng = new scala.util.Random(5)
    val ranks = BpeKernel.rankMap(Bpe.merges)
    val words = Seq.fill(200)(Seq.fill(2000)(rng.nextInt(10)).mkString)
    val t0 = System.nanoTime()
    val counts = words.map(w => BpeKernel.count(
      org.apache.spark.unsafe.types.UTF8String.fromString(w), ranks))
    val dt = (System.nanoTime() - t0) / 1e9
    counts.foreach(c => c should be < 2000L)
    dt should be < 10.0
  }

  test("null text yields null, empty text yields 0") {
    val out = Seq(Some("scan scan"), None, Some(""))
      .toDF("text").select(Bpe.tokenCount(col("text")).as("n")).collect()
    out(0).getLong(0) shouldBe 2L
    out(1).isNullAt(0) shouldBe true
    out(2).getLong(0) shouldBe 0L
  }
}
