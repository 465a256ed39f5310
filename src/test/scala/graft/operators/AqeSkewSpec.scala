package graft.operators

import graft.{SparkEntry, SparkSpec}

/** R39: proves the AQE skew-split actually fires — the r38 pattern (the
  * gate hash-checks VALUES under normal confs; the optimizer feature is
  * asserted in-plan here under forced thresholds, since the default 256 MB
  * skew threshold can never trigger at test SFs).
  *
  * Three shape constraints this spec encodes, each found by watching the
  * rule decline (see the r39 gate comment for the first two):
  *   - the post-join aggregate must not require the join's partitioning;
  *   - both SortMergeJoin children must be Sort(ShuffleQueryStage) — an
  *     aggregate between shuffle and join structurally disables the rule;
  *   - the skewed side needs MANY MAP TASKS: splitting works at map-output
  *     granularity, and OptimizeSkewedJoin counts a partition as skewed
  *     only if it is also splittable, so a one-row-group parquet scan
  *     (one map) reports "0 skewed partitions" however lopsided. The gate
  *     fact is a 32-partition range for exactly this reason.
  */
class AqeSkewSpec extends SparkSpec {

  test("AQE splits the skewed partition of r39's join (skew=true in executed plan)") {
    val dir = "/root/testdata/sf0.01"
    assume(new java.io.File(dir).exists(), "testdata not present")
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize")
    // conf.get can return null (fallback confs with no default) — treat
    // both "throws" and "null" as unset on restore
    val saved = keys.map(k =>
      k -> scala.util.Try(conf.get(k)).toOption.flatMap(Option(_))).toMap
    try {
      // broadcast disabled so the join stays sort-merge (a broadcast join
      // has no skewed shuffle partition to split); thresholds shrunk so the
      // hot key-0 partition (~3/4 of the 200k-row fact, ~400 KB vs ~90 KB
      // siblings) is skewed at gate sizes under the same factor-2 rule
      // production uses
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16384")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8192")
      conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1024")
      val df = SparkEntry.queries("r39_aqe_skew_join")(spark, dir)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      withClue(s"executed plan:\n$plan\n") {
        plan should include("skew=true")
      }
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
