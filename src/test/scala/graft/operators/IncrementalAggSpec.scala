package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private def dec(v: String) = new java.math.BigDecimal(v)

  test("applyDelta equals a full recompute over the post-change rows (R31)") {
    val base = Seq(
      ("A", "10.00"), ("A", "20.00"), ("B", "5.50"), ("C", "7.25"))
      .toDF("k", "v0").select(col("k"), col("v0").cast(DecimalType(18, 2)).as("v"))
    val state = IncrementalAgg.sumState(base, Seq("k"), Seq("v"))
    // delete one A, update B (D old + I new), insert into new group D
    val changes = Seq(
      ("A", "10.00", "D"), ("B", "5.50", "D"), ("B", "6.00", "I"),
      ("D", "1.00", "I"))
      .toDF("k", "v0", "op").select(col("k"),
        col("v0").cast(DecimalType(18, 2)).as("v"), col("op"))
    val out = IncrementalAgg.applyDelta(state, changes, Seq("k"), "op", Seq("v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDecimal(2).stripTrailingZeros()))).toMap
    out.keySet shouldBe Set("A", "B", "C", "D")
    out("A") shouldBe ((1L, dec("2E+1")))   // 20.00 survives
    out("B") shouldBe ((1L, dec("6")))      // updated image
    out("C") shouldBe ((1L, dec("7.25")))   // untouched
    out("D") shouldBe ((1L, dec("1")))      // fresh group
  }

  test("groups deleted to zero rows disappear from the state (R31)") {
    val base = Seq(("X", "3.00"), ("Y", "4.00")).toDF("k", "v0")
      .select(col("k"), col("v0").cast(DecimalType(18, 2)).as("v"))
    val state = IncrementalAgg.sumState(base, Seq("k"), Seq("v"))
    val changes = Seq(("X", "3.00", "D")).toDF("k", "v0", "op")
      .select(col("k"), col("v0").cast(DecimalType(18, 2)).as("v"), col("op"))
    val out = IncrementalAgg.applyDelta(state, changes, Seq("k"), "op", Seq("v"))
      .select("k").as[String].collect().toSet
    out shouldBe Set("Y")
  }

  test("a delete driving a group's count negative fails loudly, not silently (R31)") {
    val base = Seq(("X", "3.00")).toDF("k", "v0")
      .select(col("k"), col("v0").cast(DecimalType(18, 2)).as("v"))
    val state = IncrementalAgg.sumState(base, Seq("k"), Seq("v"))
    // the same delete applied twice (a violated CDC contract) → n = -1
    val doubled = Seq(("X", "3.00", "D"), ("X", "3.00", "D")).toDF("k", "v0", "op")
      .select(col("k"), col("v0").cast(DecimalType(18, 2)).as("v"), col("op"))
    val ex = intercept[Exception] {
      IncrementalAgg.applyDelta(state, doubled, Seq("k"), "op", Seq("v")).collect()
    }
    ex.getMessage should include("inconsistent delta")
  }

  test("a value-mismatched delete that zeroes a group fails loudly, not silently (R31)") {
    val base = Seq(("X", "3.00")).toDF("k", "v0")
      .select(col("k"), col("v0").cast(DecimalType(18, 2)).as("v"))
    val state = IncrementalAgg.sumState(base, Seq("k"), Seq("v"))
    // n reaches exactly 0 but the delete's value image mismatches state
    // (5.00 vs the held 3.00) → residual sum −2.00 must not vanish silently
    val wrong = Seq(("X", "5.00", "D")).toDF("k", "v0", "op")
      .select(col("k"), col("v0").cast(DecimalType(18, 2)).as("v"), col("op"))
    val ex = intercept[Exception] {
      IncrementalAgg.applyDelta(state, wrong, Seq("k"), "op", Seq("v")).collect()
    }
    ex.getMessage should include("inconsistent delta")
  }

  test("floating-point sum columns are rejected at call time, not mid-stream (R31)") {
    // double sums accumulate in nondeterministic order, so the emptied-group
    // residual guard would raise on legitimate streams — reject up front
    val base = Seq(("X", 3.0), ("Y", 4.0)).toDF("k", "v")
    val ex = intercept[IllegalArgumentException] {
      IncrementalAgg.sumState(base, Seq("k"), Seq("v"))
    }
    ex.getMessage should include("exact")
    val state = IncrementalAgg.sumState(
      base.select(col("k"), col("v").cast(DecimalType(18, 2)).as("v")), Seq("k"), Seq("v"))
    val changes = Seq(("X", 3.0f, "D")).toDF("k", "v", "op")
    intercept[IllegalArgumentException] {
      IncrementalAgg.applyDelta(state, changes, Seq("k"), "op", Seq("v"))
    }
  }

  test("maintenance over a chain of deltas equals recompute at every step (R31)") {
    val rnd = new scala.util.Random(42)
    var rows = (0 until 200).map(i => (s"g${i % 7}", dec((i % 13).toString + ".25")))
    var state = IncrementalAgg.sumState(
      rows.toDF("k", "v").select(col("k"), col("v").cast(DecimalType(18, 2)).as("v")),
      Seq("k"), Seq("v"))
    for (_ <- 1 to 3) {
      val dels = rnd.shuffle(rows).take(30)
      val ins = (0 until 25).map(_ => (s"g${rnd.nextInt(9)}", dec(rnd.nextInt(50).toString)))
      rows = rows.diff(dels) ++ ins
      val changes =
        dels.map { case (k, v) => (k, v, "D") } ++ ins.map { case (k, v) => (k, v, "I") }
      state = IncrementalAgg.applyDelta(state,
        changes.toDF("k", "v", "op")
          .select(col("k"), col("v").cast(DecimalType(18, 2)).as("v"), col("op")),
        Seq("k"), "op", Seq("v"))
      val expect = rows.groupBy(_._1).view.mapValues { g =>
        (g.size.toLong, g.map(_._2).reduce(_ add _).stripTrailingZeros())
      }.toMap
      val got = state.collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDecimal(2).stripTrailingZeros()))).toMap
      got shouldBe expect
    }
  }
}
