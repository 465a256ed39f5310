package graft.streaming

import graft.SparkSpec
import graft.operators.{HeavyHitters, SnapshotTable}
import org.apache.spark.sql.DataFrame

/** X16: streaming Misra–Gries maintenance — stream result ≡ the batch
  * operator on the union, replayed batches are content no-ops, any batch
  * split converges, the coverage guarantee telescopes across batches,
  * and the running total is exact. */
class StreamingHeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def stream(seed: Int, n: Int): Seq[Long] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { _ =>
      val r = rnd.nextDouble()
      if (r < 0.28) 11L else if (r < 0.40) 22L
      else 5000L + rnd.nextInt(3000)
    }
  }

  private def feed(name: String, batches: Seq[Seq[Long]], cap: Int)
      : (String, DataFrame) = {
    val state = graft.Scratch.fresh(name)
    batches.zipWithIndex.foreach { case (xs, i) =>
      StreamingHeavyHitters.applyBatch(spark, xs.toDF("k"), i, "k", cap, state)
    }
    (state, batches.flatten.toDF("k"))
  }

  private def exact(state: String, corpus: DataFrame, cap: Int): Seq[(Long, Long)] =
    StreamingHeavyHitters.exactFromState(spark, state, corpus, "k", cap)
      .as[(Long, Long)].collect().toSeq

  test("3-batch stream equals the batch operator on the union (X16)") {
    val xs = stream(3, 15000)
    val batches = xs.grouped(5000).toSeq
    val (state, corpus) = feed("x16spec_a", batches, cap = 15)
    exact(state, corpus, 15) shouldBe
      HeavyHitters.exact(corpus, "k", 15).as[(Long, Long)].collect().toSeq
  }

  test("a replayed batch id is a content no-op (X16)") {
    val (state, corpus) = feed("x16spec_b", Seq(stream(7, 4000)), cap = 10)
    val v1 = SnapshotTable.latestVersion(state)
    val before = exact(state, corpus, 10)
    // at-least-once redelivery of batch 0: same id, same content
    StreamingHeavyHitters.applyBatch(spark, stream(7, 4000).toDF("k"), 0L,
      "k", 10, state)
    SnapshotTable.latestVersion(state) shouldBe v1
    exact(state, corpus, 10) shouldBe before
  }

  test("any batch split converges to the same exact result (X16)") {
    val xs = stream(11, 12000)
    val splits = Seq(
      xs.grouped(12000).toSeq,          // single batch
      xs.grouped(1000).toSeq,           // 12 batches
      Seq(xs.take(11), xs.drop(11)))    // lopsided
    val results = splits.zipWithIndex.map { case (bs, i) =>
      val (state, corpus) = feed(s"x16spec_c$i", bs, cap = 12)
      exact(state, corpus, 12)
    }
    results.distinct should have size 1
  }

  test("a batch that empties the summary keeps the running total (X16 regression)") {
    // cap 8: batch 0 fills 8 singleton counters, batch 1's 8 fresh keys
    // force the merge to subtract the 9th-largest (1) — every counter
    // cancels and the summary is legitimately EMPTY. n_total must still
    // accumulate, or the final threshold compares against a fraction of
    // the true stream size.
    val state = graft.Scratch.fresh("x16spec_e")
    StreamingHeavyHitters.applyBatch(spark, (1L to 8L).toDF("k"), 0, "k", 8, state)
    StreamingHeavyHitters.applyBatch(spark, (11L to 18L).toDF("k"), 1, "k", 8, state)
    val (pairs, n) = StreamingHeavyHitters.readState(spark, state)
    pairs shouldBe empty
    n shouldBe 16L
    StreamingHeavyHitters.applyBatch(spark, Seq.fill(48)(99L).toDF("k"), 2, "k", 8, state)
    StreamingHeavyHitters.readState(spark, state)._2 shouldBe 64L
  }

  test("coverage guarantee and exact running total across adversarial batches (X16)") {
    // the heavy key arrives interleaved with bursts of distinct noise —
    // the worst case for counter eviction
    val heavy = Seq.fill(4000)(99L)
    val noise = (0 until 8000).map(i => 100000L + i)
    val batches = (heavy.grouped(500) zip noise.grouped(1000)).map {
      case (h, m) => h ++ m
    }.toSeq
    val (state, corpus) = feed("x16spec_d", batches, cap = 8)
    val (pairs, n) = StreamingHeavyHitters.readState(spark, state)
    n shouldBe 12000L
    pairs.map(_._1) should contain(99L) // freq 1/3 ≫ 1/9: must survive
    exact(state, corpus, 8) shouldBe Seq((99L, 4000L))
  }
}
