package graft.streaming

import graft.SparkSpec
import graft.operators.SnapshotTxn
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X19: exactly-once multi-table streaming ingest — maintained state ≡
  * the one-shot batch aggregate under any batch split, the totals table
  * can never skew from by_key at ANY published txn (the crash window X13
  * had to repair is structurally gone), and replays are pure no-ops. */
class StreamingTxnIngestSpec extends SparkSpec {
  import spark.implicits._

  private def events(seed: Int, n: Int): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val types = Seq("click", "view", "purchase")
    (0 until n).map(i => (types(rnd.nextInt(3)), rnd.nextInt(10000) / 100.0))
      .toDF("event_type", "value")
  }

  private def expected(ev: DataFrame): Set[(String, Long, Double)] = {
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(18, 2)
    val byKey = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("value").cast(dec)).as("s"))
    byKey.select(col("event_type"), col("n"), col("s").cast("double"))
      .as[(String, Long, Double)].collect().toSet ++
      byKey.agg(sum("n"), sum(col("s")).cast("double"))
        .as[(Long, Double)].collect().map { case (n, s) => ("__total", n, s) }.toSet
  }

  private def stateOf(root: String, txn: Long = -1L): Set[(String, Long, Double)] =
    StreamingTxnIngest.current(spark, root, txn)
      .as[(String, Long, Double)].collect().toSet

  test("maintained state equals the one-shot aggregate; batch split invisible (X19)") {
    val ev = events(1, 600).cache()
    val one = graft.Scratch.fresh("x19spec_one")
    StreamingTxnIngest.applyBatch(spark, ev, 0L, "event_type", "value", one)
    val three = graft.Scratch.fresh("x19spec_three")
    val parts = ev.withColumn("__i", monotonically_increasing_id())
    (0 until 3).foreach { i =>
      StreamingTxnIngest.applyBatch(spark,
        parts.filter(col("__i") % 3 === i).drop("__i"), i.toLong,
        "event_type", "value", three)
    }
    stateOf(one) shouldBe expected(ev)
    stateOf(three) shouldBe expected(ev)
    ev.unpersist()
  }

  test("a crash before the txn publish leaves no skew at any txn; replay repairs (X19)") {
    val root = graft.Scratch.fresh("x19spec_crash")
    val b0 = events(2, 300)
    val b1 = events(3, 300)
    StreamingTxnIngest.applyBatch(spark, b0, 0L, "event_type", "value", root)
    intercept[RuntimeException] {
      StreamingTxnIngest.applyBatch(spark, b1, 1L, "event_type", "value", root,
        beforePublish = () => throw new RuntimeException("die before txn publish"))
    }
    // the cut did not advance and still reflects batch 0 exactly
    SnapshotTxn.latestTxn(root) shouldBe Some(1L)
    stateOf(root) shouldBe expected(b0)
    // replay of the failed batch repairs; a second replay is a pure no-op
    StreamingTxnIngest.applyBatch(spark, b1, 1L, "event_type", "value", root)
    stateOf(root) shouldBe expected(b0.unionByName(b1))
    val txns = SnapshotTxn.txns(root)
    StreamingTxnIngest.applyBatch(spark, b1, 1L, "event_type", "value", root)
    SnapshotTxn.txns(root) shouldBe txns
    // the invariant holds at EVERY published txn, not just at rest
    txns.foreach { t =>
      val byKey = SnapshotTxn.readAt(spark, root, "by_key", t)
        .agg(sum("n"), count(lit(1)), sum(col("s")).cast("double"))
        .as[(Long, Long, Double)].head()
      val totals = SnapshotTxn.readAt(spark, root, "totals", t)
        .select(col("n_rows"), col("n_keys"), col("s").cast("double"))
        .as[(Long, Long, Double)].head()
      withClue(s"txn $t: ") { byKey shouldBe totals }
    }
  }
}
