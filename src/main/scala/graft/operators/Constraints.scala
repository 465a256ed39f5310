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
}
