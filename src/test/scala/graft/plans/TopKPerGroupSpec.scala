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

  test("physical plan uses TopKPerGroupExec with a single clustering exchange") {
    val native = TopK.perGroup(df, Seq("grp"), Seq("score"), k = 3)
    val plan = native.queryExecution.executedPlan.toString
    plan should include("TopKPerGroup") // exec node prints without the Exec suffix
    plan should not include "Window"
    // exactly one shuffle: the ClusteredDistribution requirement
    "Exchange hashpartitioning".r.findAllIn(plan).size shouldBe 1
  }

  test("groups smaller than k return all their rows") {
    val tiny = Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("b", 3L, 3.0)).toDF("grp", "id", "score")
    TopK.perGroup(tiny, Seq("grp"), Seq("score"), k = 5).count() shouldBe 3
  }
}
