package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  test("fromChanges builds versioned history with tombstone closes and re-inserts (R34)") {
    // key 1: I → U → D → re-I; key 2: single I; key 3: I then D
    val changes = Seq(
      (1L, "a1", "I", 1L), (1L, "a2", "U", 3L), (1L, "", "D", 5L), (1L, "a3", "I", 8L),
      (2L, "b1", "I", 2L),
      (3L, "c1", "I", 1L), (3L, "", "D", 4L)).toDF("k", "attr", "op", "seq")
    val out = Scd2.fromChanges(changes, Seq("k"), "seq")
      .select("k", "attr", "valid_from", "valid_to", "is_current")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4)))
      .toSet
    out shouldBe Set(
      (1L, "a1", 1L, 3L, false),
      (1L, "a2", 3L, 5L, false),
      (1L, "a3", 8L, -1L, true),   // re-insert after tombstone reopens
      (2L, "b1", 2L, -1L, true),
      (3L, "c1", 1L, 4L, false))   // closed by tombstone, no current row
  }

  test("point-in-time lookup via the version intervals (R34 + as-of consumers)") {
    val changes = Seq(
      (1L, "v1", "I", 10L), (1L, "v2", "U", 20L), (1L, "v3", "U", 30L))
      .toDF("k", "attr", "op", "seq")
    val hist = Scd2.fromChanges(changes, Seq("k"), "seq")
    // fact at seq 25 must see v2
    val at25 = hist.filter(col("valid_from") <= 25 &&
      (col("valid_to").isNull || col("valid_to") > 25))
    at25.select("attr").as[String].collect() shouldBe Array("v2")
    // exactly one current row
    hist.filter(col("is_current")).count() shouldBe 1L
  }
}
