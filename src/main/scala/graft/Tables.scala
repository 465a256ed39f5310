package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Typed access to the driver-generated testdata tables (TESTDATA.md).
  *
  * Plain parquet scans — Catalyst pushes filters/projections down to the
  * reader, so callers should never pre-materialize or cache these.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  /** `events.ts` is TIMESTAMP(NANOS) parquet, which Spark 4 only reads via
    * `spark.sql.legacy.parquet.nanosAsLong` (set on every graft session).
    * Normalize to TimestampType with integer division — double division
    * would lose precision above 2^53 ns (~1970+104 days).
    */
  def events: DataFrame = {
    val raw = t("events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
