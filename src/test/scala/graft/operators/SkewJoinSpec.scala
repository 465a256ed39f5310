package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join on skewed data") {
    // 10k rows of one hot key + a tail
    val big = ((1 to 10000).map(i => (1L, s"row$i")) ++ (1 to 100).map(i => (i.toLong + 1, s"tail$i")))
      .toDF("k", "payload")
    val small = (1L to 101L).map(k => (k, s"dim$k")).toDF("k", "dim")

    val plain  = big.join(small, "k")
    val salted = SkewJoin.saltedJoin(big, small, "k", salts = 8)

    salted.count() shouldBe plain.count()
    val a = plain.select("k", "payload", "dim").collect().map(_.toSeq).toSet
    val b = salted.select("k", "payload", "dim").collect().map(_.toSeq).toSet
    b shouldBe a
    // and the salt actually spreads the hot key across partitions
    val parts = salted.groupBy(spark_partition_id().as("p")).count().count()
    parts should be > 1L
  }
}
