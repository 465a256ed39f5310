package graft.operators

import graft.SparkSpec
import graft.functions.BloomAgg
import org.apache.spark.sql.functions._

/** R51: bloom sidecars — no inserted key is ever missed (at any
  * partitioning: the bitset merge is OR), false positives stay near the
  * design rate, point reads skip non-matching files on range-overlapped
  * layouts, and missing sidecars degrade to scan-everything. */
class SnapshotBloomSpec extends SparkSpec {
  import spark.implicits._

  test("bloom_bits never misses an inserted key; bits are partitioning-invariant") {
    val keys = (0L until 5000L).map(_ * 7919L)
    def bitsOf(parts: Int): Array[Byte] = keys.toDF("k").repartition(parts)
      .agg(BloomAgg.bloomBits(col("k"), m = 65536, k = 3)).head().getAs[Array[Byte]](0)
    val bits = bitsOf(1)
    bitsOf(7) should contain theSameElementsInOrderAs bits // OR-merge: order/split free
    keys.foreach { key =>
      BloomAgg.mightContain(bits, 65536, 3, key) shouldBe true
    }
    // FP rate near design: 5000 keys in 65536 bits ≈ 1.2 bits/key... use
    // the actual formula (1 - e^(-kn/m))^k ≈ 4.3% here; allow 3× slack
    val fps = (1L to 20000L).map(_ * 7919L + 13L)
      .count(k => BloomAgg.mightContain(bits, 65536, 3, k))
    (fps.toDouble / 20000) should be < 0.15
  }

  test("readPoint skips range-overlapped files and returns the exact rows (R51)") {
    val t = graft.Scratch.fresh("bloomspec_t")
    val rows = (0L until 4000L).map(i => (i, s"v$i")).toDF("k", "v")
    (0 until 4).foreach { i =>
      SnapshotTable.commit(spark, t, rows.filter(col("k") % 4 === i).coalesce(1),
        mode = if (i == 0) SnapshotTable.Overwrite else SnapshotTable.Append): Unit
    }
    SnapshotBloom.attach(spark, t, Seq("k"))
    // every probed key returns exactly its row, and the probe skips files
    Seq(0L, 1L, 2L, 3L, 17L, 3999L).foreach { key =>
      val (kept, skipped) = SnapshotBloom.prunedFiles(spark, t, "k", key)
      withClue(s"key $key: ") {
        (kept.size + skipped.size) shouldBe 4
        skipped.size should be >= 2 // ranges overlap fully; blooms prune
        SnapshotBloom.readPoint(spark, t, "k", key)
          .as[(Long, String)].collect().toSeq shouldBe Seq((key, s"v$key"))
      }
    }
    // absent key: correct empty result regardless of what was skipped
    SnapshotBloom.readPoint(spark, t, "k", 999999L).count() shouldBe 0L
  }

  test("files without a sidecar are always scanned (R51)") {
    val t = graft.Scratch.fresh("bloomspec_nosc")
    val rows = (0L until 100L).map(i => (i, i * 2)).toDF("k", "v")
    SnapshotTable.commit(spark, t, rows.coalesce(1))
    // no attach: everything kept, read still exact
    val (kept, skipped) = SnapshotBloom.prunedFiles(spark, t, "k", 5L)
    skipped shouldBe empty
    kept should not be empty
    SnapshotBloom.readPoint(spark, t, "k", 5L)
      .as[(Long, Long)].collect().toSeq shouldBe Seq((5L, 10L))
    // attach on one column leaves OTHER columns un-bloomed but scannable
    SnapshotBloom.attach(spark, t, Seq("k"))
    val (kept2, skipped2) = SnapshotBloom.prunedFiles(spark, t, "v", 10L)
    skipped2 shouldBe empty
    kept2 should not be empty
  }
}
