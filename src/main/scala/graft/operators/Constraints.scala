package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** R36: declarative row-level data-quality constraints — the
  * expectations/quarantine step every production ingest runs before data
  * reaches training or analytics (Delta constraints / dbt tests /
  * Deequ-style checks, as plain Spark). Each rule is a named boolean
  * Column; every row gets the SORTED list of rule names it violates and an
  * `is_valid` flag, so the caller can quarantine, alert on, or drop
  * violations without a second scan. NULL predicate results count as
  * violations (a rule that cannot evaluate did not pass — the conservative
  * reading a quarantine needs).
  *
  * Scale shape: one codegen'd projection, no shuffle, no UDF — constraint
  * checking at 100 TB costs exactly one pass it shares with whatever scan
  * runs anyway. */
object Constraints {

  def check(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    val tagged = array(rules.map { case (name, pred) =>
      when(!coalesce(pred, lit(false)), lit(name))
    }: _*)
    df.withColumn("violations", sort_array(filter(tagged, v => v.isNotNull)))
      .withColumn("is_valid", size(col("violations")) === 0)
  }

  /** (valid rows without the audit columns, quarantined rows with them). */
  def quarantine(df: DataFrame, rules: Seq[(String, Column)]): (DataFrame, DataFrame) = {
    val checked = check(df, rules)
    (checked.filter(col("is_valid")).drop("violations", "is_valid"),
      checked.filter(!col("is_valid")))
  }

  /** How [[commitChecked]] treats violating rows. */
  sealed trait Policy
  /** Any violation aborts — NO version is published (Delta's FAIL). */
  case object Fail extends Policy
  /** Valid rows publish; violations are silently dropped (DROP). */
  case object Drop extends Policy
  /** Valid rows publish; violations Append — with their audit columns —
    * to `quarantineTable` for triage (the dead-letter pattern). */
  case object Quarantine extends Policy

  final case class CheckedCommit(version: Option[Long], nValid: Long,
      nViolations: Long, byRule: Map[String, Long])

  /** R48: expectation-gated snapshot commit (R36 × R40) — the Delta Live
    * Tables "expectations" contract: data publishes ONLY through its
    * quality rules, and a reader can never observe a version that violates
    * a Fail-policy constraint, because the violating commit never produces
    * a manifest at all (R40 manifests make the gate atomic — there is no
    * torn "half-published, then validated" window to crash into).
    *
    * One pass evaluates the rules (a codegen'd projection cached for the
    * duration), a violations-sized aggregate collects per-rule counts for
    * the report, and the commit itself is the R40 path. Under
    * [[Quarantine]] the valid-table commit and the dead-letter Append are
    * per-table atomic (the X13 discipline), so a crash between them loses
    * no data — the violations are re-derivable from the input, and the
    * published valid version is already consistent. */
  def commitChecked(spark: org.apache.spark.sql.SparkSession, table: String,
      df: DataFrame, rules: Seq[(String, Column)], policy: Policy = Fail,
      mode: SnapshotTable.Mode = SnapshotTable.Overwrite,
      tag: Option[String] = None,
      quarantineTable: Option[String] = None): CheckedCommit = {
    require(policy != Quarantine || quarantineTable.nonEmpty,
      "Quarantine policy needs a quarantineTable")
    val checked = Caches.owned(check(df, rules))
    try {
      val byRule = checked.select(explode(col("violations")).as("rule"))
        .groupBy("rule").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val Array(nValid, nViol) = checked
        .agg(count(when(col("is_valid"), 1)), count(when(!col("is_valid"), 1)))
        .head().toSeq.map(_.asInstanceOf[Long]).toArray
      if (policy == Fail && nViol > 0)
        return CheckedCommit(None, nValid, nViol, byRule)
      val valid = checked.filter(col("is_valid")).drop("violations", "is_valid")
      val v = SnapshotTable.commit(spark, table, valid, mode = mode, tag = tag)
      if (policy == Quarantine && nViol > 0)
        SnapshotTable.commit(spark, quarantineTable.get,
          checked.filter(!col("is_valid")).drop("is_valid")
            .withColumn("violations", array_join(col("violations"), ",")),
          mode = SnapshotTable.Append, tag = tag): Unit
      CheckedCommit(Some(v), nValid, nViol, byRule)
    } finally {
      checked.unpersist(): Unit
    }
  }
}
