package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ids = (0L until 10000L).toDF("id")

  test("hash split is deterministic, disjoint, and ~proportional (T6)") {
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val a = Sampling.assignSplits(ids, "id", splits).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Sampling.assignSplits(ids.repartition(7), "id", splits).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    a shouldBe b // partitioning-independent — no RNG state anywhere
    val counts = a.values.groupBy(identity).view.mapValues(_.size).toMap
    counts("train").toDouble / 10000 shouldBe 0.8 +- 0.02
    counts("val").toDouble / 10000 shouldBe 0.1 +- 0.02
    counts("test").toDouble / 10000 shouldBe 0.1 +- 0.02
  }

  test("stratifiedSample takes exactly n per stratum, deterministically (T7)") {
    val df = (0L until 1000L).map(i => (i, s"lang${i % 4}")).toDF("id", "lang")
    val a = Sampling.stratifiedSample(df, "lang", "id", 10)
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    a.groupBy(_._1).values.foreach(_.size shouldBe 10)
    // partitioning-independent (pure function of the data)
    val b = Sampling.stratifiedSample(df.repartition(13), "lang", "id", 10)
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    b shouldBe a
    // matches the window-function reference formulation
    val ref = df.withColumn("__u", md5(col("id").cast("string")))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("lang")
          .orderBy(col("__u"), col("id"))))
      .filter(col("rk") <= 10)
      .select("lang", "id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    a shouldBe ref
    // small strata yield all their rows
    val tiny = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("id", "lang")
    Sampling.stratifiedSample(tiny, "lang", "id", 10).count() shouldBe 3
  }

  test("temperatureResample rebalances by sqrt weights, deterministically (T11)") {
    // sources of very different sizes: 6400 / 1600 / 400 rows → integer
    // sqrt weights 80 / 40 / 20 → quotas 140·(4/7, 2/7, 1/7) = 80/40/20,
    // flattening the 16:4:1 corpus ratio to 4:2:1
    val df = ((0L until 6400L).map((_, "big")) ++
      (6400L until 8000L).map((_, "mid")) ++
      (8000L until 8400L).map((_, "small"))).toDF("id", "src")
    val out = Sampling.temperatureResample(df, "src", "id", targetTotal = 140)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val bySrc = out.groupBy(_._2).view.mapValues(_.length).toMap
    bySrc shouldBe Map("big" -> 80, "mid" -> 40, "small" -> 20)
    // pure function of the data — partitioning cannot change the selection
    val again = Sampling.temperatureResample(df.repartition(11), "src", "id", 140)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    again.toSet shouldBe out.toSet
    // selection within a stratum is md5-order: the picked set matches the
    // window reference formulation
    val ref = df.withColumn("__u", md5(col("id").cast("string")))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("src")
          .orderBy(col("__u"), col("id"))))
      .filter((col("src") === "big" && col("rk") <= 80) ||
        (col("src") === "mid" && col("rk") <= 40) ||
        (col("src") === "small" && col("rk") <= 20))
      .select("id", "src")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    out.toSet shouldBe ref
  }

  test("hashSample keeps a stable ~fraction and is a subset relation (T6)") {
    val s10 = Sampling.hashSample(ids, "id", 0.1).as[Long].collect().toSet
    val s20 = Sampling.hashSample(ids, "id", 0.2).as[Long].collect().toSet
    s10.size.toDouble / 10000 shouldBe 0.1 +- 0.02
    // threshold sampling is monotone: the 10% sample is inside the 20%
    s10.subsetOf(s20) shouldBe true
    // re-evaluation returns the identical subset
    Sampling.hashSample(ids, "id", 0.1).as[Long].collect().toSet shouldBe s10
  }
}
