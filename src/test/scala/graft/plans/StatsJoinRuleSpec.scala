package graft.plans

import graft.SparkSpec
import graft.operators.SnapshotTable
import org.apache.spark.sql.DataFrame

/** R63: the stats-informed SQL-join rule — graft-pinned sides whose exact
  * manifest bytes fit the budget broadcast with no hint and no session
  * threshold; the rule never changes answers, respects explicit hints,
  * and leaves non-graft joins alone. */
class StatsJoinRuleSpec extends SparkSpec {

  private def freshTables(): (String, String) = {
    import spark.implicits._
    val wh = graft.Scratch.fresh("sjr_wh")
    val fact = (0 until 5000).map(i => (i.toLong, (i % 50).toLong)).toDF("fk", "k")
    val dim = (0 until 50).map(i => (i.toLong, s"name-$i")).toDF("k", "name")
    SnapshotTable.commit(spark, s"$wh/fact", fact)
    SnapshotTable.commit(spark, s"$wh/dim", dim)
    StatsJoinRule.attach(spark)
    spark.conf.set("spark.sql.catalog.sjr_cat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.sjr_cat.warehouse", wh)
    ("sjr_cat.fact", "sjr_cat.dim")
  }

  private def executed(df: DataFrame): String = {
    df.count()
    df.queryExecution.executedPlan.toString
  }

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("small graft side broadcasts with the session threshold disabled; answers invariant") {
    val (fact, dim) = freshTables()
    val sql = s"SELECT f.fk, d.name FROM $fact f JOIN $dim d ON f.k = d.k"
    withConfs("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val on = spark.sql(sql)
      executed(on) should include("BroadcastHashJoin")
      withConfs("spark.graft.statsJoin.enabled" -> "false") {
        val off = spark.sql(sql)
        executed(off) should include("SortMergeJoin")
        off.collect().toSet shouldBe on.collect().toSet
      }
    }
  }

  test("a budget below both sides' bytes leaves the join alone") {
    val (fact, dim) = freshTables()
    val sql = s"SELECT f.fk, d.name FROM $fact f JOIN $dim d ON f.k = d.k"
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.graft.statsJoin.broadcastBytes" -> "1") {
      executed(spark.sql(sql)) should include("SortMergeJoin")
    }
  }

  test("an explicit user hint wins over the rule") {
    val (fact, dim) = freshTables()
    // user says merge: the rule must not stamp its broadcast on top
    val sql = s"SELECT /*+ MERGE(f) */ f.fk, d.name FROM $fact f JOIN $dim d ON f.k = d.k"
    withConfs("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      executed(spark.sql(sql)) should include("SortMergeJoin")
    }
  }

  test("non-graft joins are untouched") {
    import spark.implicits._
    val dir = graft.Scratch.fresh("sjr_plain")
    (0 until 5000).map(i => (i.toLong, (i % 50).toLong)).toDF("fk", "k")
      .write.parquet(s"$dir/fact")
    (0 until 50).map(i => (i.toLong, s"name-$i")).toDF("k", "name")
      .write.parquet(s"$dir/dim")
    StatsJoinRule.attach(spark)
    val f = spark.read.parquet(s"$dir/fact")
    val d = spark.read.parquet(s"$dir/dim")
    withConfs("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      executed(f.join(d, "k")) should include("SortMergeJoin")
    }
  }
}
