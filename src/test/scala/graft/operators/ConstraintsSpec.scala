package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ConstraintsSpec extends SparkSpec {
  import spark.implicits._

  private val rules = Seq(
    "positive" -> (col("v") > 0),
    "bounded" -> (col("v") <= 100),
    "named" -> col("name").isNotNull)

  test("check tags each row with its sorted violation list (R36)") {
    val df = Seq(
      (1L, 5, "a"),            // clean
      (2L, -1, "b"),           // positive
      (3L, 500, null: String), // bounded + named
      (4L, -7, null: String))  // positive + named (−7 is within the bound)
      .toDF("id", "v", "name")
    val out = Constraints.check(df, rules)
      .select(col("id"), col("violations"), col("is_valid"))
      .collect().map(r => r.getLong(0) -> ((r.getSeq[String](1), r.getBoolean(2)))).toMap
    out(1L) shouldBe ((Seq(), true))
    out(2L) shouldBe ((Seq("positive"), false))
    out(3L) shouldBe ((Seq("bounded", "named"), false))
    out(4L) shouldBe ((Seq("named", "positive"), false))
  }

  test("null predicate results count as violations; quarantine splits losslessly (R36)") {
    val df = Seq((1L, Some(5), "a"), (2L, None, "b"), (3L, Some(50), "c"))
      .toDF("id", "v", "name")
    // v NULL → (v > 0) is NULL → conservative violation
    val (valid, bad) = Constraints.quarantine(df, rules)
    valid.select("id").as[Long].collect().toSet shouldBe Set(1L, 3L)
    bad.select("id").as[Long].collect().toSet shouldBe Set(2L)
    valid.columns.toSeq shouldBe df.columns.toSeq // audit columns dropped
    (valid.count() + bad.count()) shouldBe df.count()
  }

  private val mixed = Seq((1L, 5, "a"), (2L, -1, "b"), (3L, 500, "c"), (4L, 50, "d"))

  test("Fail policy publishes nothing on any violation, everything when clean (R48)") {
    val t = graft.Scratch.fresh("r48spec_fail")
    val res = Constraints.commitChecked(spark, t, mixed.toDF("id", "v", "name"),
      rules, Constraints.Fail)
    res.version shouldBe None
    res.nValid shouldBe 2L
    res.nViolations shouldBe 2L
    res.byRule shouldBe Map("positive" -> 1L, "bounded" -> 1L)
    SnapshotTable.versions(t) shouldBe Seq.empty
    val clean = Constraints.commitChecked(spark, t,
      mixed.filter(r => r._2 > 0 && r._2 <= 100).toDF("id", "v", "name"),
      rules, Constraints.Fail)
    clean.version shouldBe Some(1L)
    SnapshotTable.read(spark, t).select("id").as[Long].collect().toSet shouldBe Set(1L, 4L)
  }

  test("Drop publishes valid rows only; Quarantine also dead-letters the rest (R48)") {
    val tDrop = graft.Scratch.fresh("r48spec_drop")
    Constraints.commitChecked(spark, tDrop, mixed.toDF("id", "v", "name"),
      rules, Constraints.Drop).version shouldBe Some(1L)
    SnapshotTable.read(spark, tDrop).select("id").as[Long].collect().toSet shouldBe
      Set(1L, 4L)

    val tMain = graft.Scratch.fresh("r48spec_main")
    val tQuar = graft.Scratch.fresh("r48spec_quar")
    Constraints.commitChecked(spark, tMain, mixed.toDF("id", "v", "name"),
      rules, Constraints.Quarantine, quarantineTable = Some(tQuar))
    SnapshotTable.read(spark, tMain).select("id").as[Long].collect().toSet shouldBe
      Set(1L, 4L)
    SnapshotTable.read(spark, tQuar)
      .select("id", "violations").as[(Long, String)].collect().toSet shouldBe
      Set((2L, "positive"), (3L, "bounded"))
  }
}
