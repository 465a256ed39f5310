package graft.streaming

import graft.SparkSpec
import graft.operators.{SnapshotDv, SnapshotTable}
import org.apache.spark.sql.functions._

/** X21: streamed MoR deletes ≡ one batch delete, shard splits converge,
  * replayed batch ids append nothing. */
class StreamingMorDeletesSpec extends SparkSpec {
  import spark.implicits._

  test("streamed deletes converge to the batch result; replays append nothing (X21)") {
    def fresh(name: String): String = {
      val t = graft.Scratch.fresh(name)
      SnapshotTable.commit(spark, t,
        (0L until 400L).map(i => (i, s"v$i")).toDF("k", "v").coalesce(2))
      t
    }
    def visible(t: String): Set[Long] =
      SnapshotDv.readMor(spark, t).select("k").as[Long].collect().toSet
    val deadIds = (0L until 400L).filter(_ % 5 == 0)
    // one-shot reference
    val tA = fresh("x21spec_a")
    StreamingMorDeletes.applyBatch(spark, deadIds.toDF("k"), 0L, "k", tA)
    val expect = visible(tA)
    expect shouldBe (0L until 400L).filterNot(_ % 5 == 0).toSet
    // 3-way split converges
    val tB = fresh("x21spec_b")
    deadIds.grouped(30).zipWithIndex.foreach { case (b, i) =>
      StreamingMorDeletes.applyBatch(spark, b.toDF("k"), i.toLong, "k", tB)
    }
    visible(tB) shouldBe expect
    // replaying an applied batch id appends nothing
    val dvT = s"$tB/_dv"
    val v = SnapshotTable.latestVersion(dvT)
    StreamingMorDeletes.applyBatch(spark, deadIds.take(30).toDF("k"), 0L, "k", tB)
    SnapshotTable.latestVersion(dvT) shouldBe v
    // fold after the stream preserves the visible rows and clears DVs
    SnapshotDv.fold(spark, tB)
    visible(tB) shouldBe expect
    SnapshotDv.vectors(spark, tB).count() shouldBe 0L
  }
}
