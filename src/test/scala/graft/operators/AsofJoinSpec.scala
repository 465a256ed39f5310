package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")

  test("as-of join picks the latest at-or-before right row per key (R18)") {
    val trades = Seq(
      (1L, 1L, ts(10)),  // after price@5  -> 100.0
      (2L, 1L, ts(20)),  // exactly at price@20 -> 200.0 (inclusive)
      (3L, 1L, ts(25)),  // after price@20 -> 200.0
      (4L, 2L, ts(10)),  // user 2 has no price before 10 -> null
      (5L, 2L, ts(40))   // after price@30 -> 300.0
    ).toDF("trade_id", "user_id", "ts")
    val prices = Seq(
      (1L, ts(5), 100.0),
      (1L, ts(20), 200.0),
      (1L, ts(90), 900.0), // later than every trade — must never match
      (2L, ts(30), 300.0)
    ).toDF("user_id", "ts", "price")

    val out = AsofJoin.asofJoin(trades, prices, Seq("user_id"), "ts", Seq("price"))
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    out shouldBe Map(
      1L -> Some(100.0), 2L -> Some(200.0), 3L -> Some(200.0),
      4L -> None, 5L -> Some(300.0))
  }

  test("as-of join preserves a matched row's genuine NULL and never stitches rows") {
    // price2 is NULL on the 2nd right row: the match at ts>=20 must yield
    // (200.0, NULL) from THAT row — not carry price2=111.0 forward from the
    // older row (the per-column-carry bug this test pins down)
    val trades = Seq((1L, 1L, ts(25))).toDF("trade_id", "user_id", "ts")
    val prices = Seq(
      (1L, ts(5), Some(100.0), Some(111.0)),
      (1L, ts(20), Some(200.0), None)
    ).toDF("user_id", "ts", "price", "price2")

    val out = AsofJoin.asofJoin(trades, prices, Seq("user_id"), "ts", Seq("price", "price2"))
      .select("trade_id", "asof_price", "asof_price2").collect()
    out.length shouldBe 1
    out.head.getDouble(1) shouldBe 200.0
    out.head.isNullAt(2) shouldBe true // genuine NULL from the matched row
  }

  test("as-of join equals the naive range-join formulation on events (R18)") {
    val ev = graft.Tables(spark, "/root/testdata/sf0.001").events
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"))

    val fast = AsofJoin.asofJoin(purchases, clicks.select(col("c_user").as("user_id"),
        col("click_ts").as("ts"), col("click_ts")),
        Seq("user_id"), "ts", Seq("click_ts"))
      .select("event_id", "asof_click_ts")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap

    val naive = purchases
      .join(clicks, col("user_id") === col("c_user") && col("click_ts") <= col("ts"), "left")
      .groupBy("event_id").agg(max("click_ts").as("asof_click_ts"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap

    fast shouldBe naive
  }
}
