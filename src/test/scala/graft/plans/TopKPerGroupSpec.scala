package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKPerGroupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = {
    val rng = new scala.util.Random(3)
    (1 to 20000).map(i => (s"g${i % 37}", i.toLong, rng.nextDouble()))
      .toDF("grp", "id", "score")
  }

  test("native top-k per group matches window row_number formulation") {
    val native = TopK.perGroup(df, Seq("grp"), Seq("score", "id"), k = 5)
    val w = Window.partitionBy("grp").orderBy(col("score").desc, col("id").desc)
    val viaWindow = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5).drop("rn")

    val a = native.collect().map(_.toSeq).toSet
    val b = viaWindow.collect().map(_.toSeq).toSet
    a shouldBe b
    native.count() shouldBe 37L * 5
  }

  test("physical plan is two-phase (partial + final) with a single clustering exchange") {
    val native = TopK.perGroup(df, Seq("grp"), Seq("score"), k = 3)
    val plan = native.queryExecution.executedPlan.toString
    plan should include("TopKPerGroup")        // final pass
    plan should include("TopKPerGroupPartial") // map-side bounded heaps
    plan should not include "Window"
    // exactly one shuffle, between partial and final (the
    // ClusteredDistribution requirement); the partial pass runs in place
    "Exchange hashpartitioning".r.findAllIn(plan).size shouldBe 1
  }

  test("perGroupOrdered supports mixed asc/desc ordering (ascending tiebreak)") {
    val tiny = Seq(("a", 1L, 2.0), ("a", 2L, 2.0), ("a", 3L, 1.0), ("b", 9L, 5.0))
      .toDF("grp", "id", "score")
    // score desc, id ASC tiebreak: group a keeps (1,2.0) then (2,2.0)
    val out = TopK.perGroupOrdered(tiny, Seq("grp"), Seq("score" -> false, "id" -> true), k = 2)
      .orderBy("grp", "id").collect().map(r => (r.getString(0), r.getLong(1)))
    out.toSeq shouldBe Seq(("a", 1L), ("a", 2L), ("b", 9L))
  }

  test("groups smaller than k return all their rows") {
    val tiny = Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("b", 3L, 3.0)).toDF("grp", "id", "score")
    TopK.perGroup(tiny, Seq("grp"), Seq("score"), k = 5).count() shouldBe 3
  }
}
