package graft.operators

import graft.SparkSpec

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of co-bucketed tables runs without a shuffle exchange") {
    val facts = (1L to 5000L).map(i => (i % 97, s"f$i")).toDF("k", "fact")
    val dims  = (0L until 97L).map(k => (k, s"d$k")).toDF("k", "dim")

    // the in-memory catalog resets per JVM but the warehouse dir persists —
    // clear both so saveAsTable never hits LOCATION_ALREADY_EXISTS
    for (t <- Seq("graft_bucket_facts", "graft_bucket_dims")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
        }
        rm(loc)
      }
    }

    Bucketing.writeBucketed(facts, "graft_bucket_facts", "k", 8)
    Bucketing.writeBucketed(dims, "graft_bucket_dims", "k", 8)

    val joined = Bucketing.table(spark, "graft_bucket_facts")
      .join(Bucketing.table(spark, "graft_bucket_dims"), "k")
    // disable auto-broadcast so the plan would need a shuffle if bucketing
    // didn't line up
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      plan should not include "Exchange hashpartitioning"
      joined.count() shouldBe 5000L
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }
}
