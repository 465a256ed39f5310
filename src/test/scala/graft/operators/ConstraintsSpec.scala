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
}
