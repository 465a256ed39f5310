package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** P14: incremental refresh ≡ first-arrival full rebuild over any batch
  * split, replay no-ops, all-duplicate batches land nothing, and the
  * corpus stays internally dup-free at every version. */
class IncrementalCorpusSpec extends SparkSpec {
  import spark.implicits._

  private def text(t: Long): String = s"text body number $t"

  /** Driver-side first-arrival reference over ordered (id, textIdx) batches. */
  private def reference(batches: Seq[Seq[(Long, Long)]]): Set[(Long, String)] = {
    val seen = scala.collection.mutable.Set.empty[Long]
    val out = scala.collection.mutable.Set.empty[(Long, String)]
    for (b <- batches; (winId, t) <- b.groupBy(_._2).map { case (t, ds) => (ds.map(_._1).min, t) }
           .toSeq.sortBy(_._1) if !seen(t)) { seen += t; out += ((winId, text(t))) }
    out.toSet
  }

  private def runBatches(name: String,
      batches: Seq[Seq[(Long, Long)]]): (String, Set[(Long, String)]) = {
    val t = graft.Scratch.fresh(name)
    def frame(b: Seq[(Long, Long)]) =
      b.map { case (id, ti) => (id, text(ti)) }.toDF("id", "text")
    IncrementalCorpus.bootstrap(spark, t, frame(batches.head), "text", "id")
    batches.tail.zipWithIndex.foreach { case (b, i) =>
      IncrementalCorpus.refresh(spark, t, frame(b), "text", "id", tag = Some(s"crawl-$i"))
    }
    (t, SnapshotTable.read(spark, t).select("id", "text").as[(Long, String)].collect().toSet)
  }

  test("three-crawl chain ≡ first-arrival reference; corpus dup-free throughout (P14)") {
    // b1: in-batch dups (ids 80..99 re-carry texts 0..19); b2: 40 novel
    // texts among cross-batch dups; b3: 10 novel among dups
    val b1 = (0L until 100L).map(i => (i, i % 80))
    val b2 = (100L until 200L).map(i => (i, (i - 40) % 120))
    val b3 = (200L until 300L).map(i => (i, i % 130))
    val batches = Seq(b1, b2, b3)
    val (t, got) = runBatches("corpus_chain", batches)
    got shouldBe reference(batches)
    SnapshotTable.versions(t) shouldBe Seq(1L, 2L, 3L)
    // every text exactly once, stored hash consistent with the text
    SnapshotTable.read(spark, t)
      .groupBy("content_hash").agg(count(lit(1)).as("n"),
        countDistinct(md5(col("text"))).as("h2"))
      .filter(col("n") > 1 || col("h2") =!= 1).count() shouldBe 0L
  }

  test("any split of the same ids covers the same text set (P14 split-invariance)") {
    val all = (0L until 300L).map(i => (i, (i * 7) % 110))
    val (_, a) = runBatches("corpus_split_a", Seq(all.take(50), all.drop(50)))
    val (_, b) = runBatches("corpus_split_b", Seq(all.take(200), all.drop(200)))
    // winners differ by arrival, but the TEXT set is the full distinct set
    a.map(_._2) shouldBe b.map(_._2)
    a.map(_._2).size shouldBe 110
  }

  test("replayed tag and all-duplicate batch land nothing (P14)") {
    val t = graft.Scratch.fresh("corpus_replay")
    def frame(ids: Seq[Long], ts: Seq[Long]) =
      ids.zip(ts).map { case (id, ti) => (id, text(ti)) }.toDF("id", "text")
    IncrementalCorpus.bootstrap(spark, t,
      frame(0L until 100L, 0L until 100L), "text", "id")
    val v1 = IncrementalCorpus.refresh(spark, t,
      frame(100L until 150L, 100L until 150L), "text", "id", tag = Some("c1"))
    v1 shouldBe 2L
    // replay: same tag, different payload — must not land
    IncrementalCorpus.refresh(spark, t,
      frame(150L until 200L, 150L until 200L), "text", "id",
      tag = Some("c1")) shouldBe v1
    SnapshotTable.latestVersion(t) shouldBe Some(v1)
    // all-duplicate batch (texts 0..59 already incumbent): fresh tag, no
    // new version
    IncrementalCorpus.refresh(spark, t,
      frame(1000L until 1060L, 0L until 60L), "text", "id",
      tag = Some("c2")) shouldBe v1
    SnapshotTable.latestVersion(t) shouldBe Some(v1)
  }
}
