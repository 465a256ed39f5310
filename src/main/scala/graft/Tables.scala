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
  /** `events.ts` has shipped as TIMESTAMP(NANOS) parquet (which Spark 4
    * only reads via `spark.sql.legacy.parquet.nanosAsLong`, set on every
    * graft session) and as plain timestamp[us] without timezone (which
    * Spark reads as TIMESTAMP_NTZ). Normalize both to TimestampType so
    * every downstream operator sees one type: nanos via integer division
    * (double division would lose precision above 2^53 ns), NTZ via a cast
    * that the UTC session timezone makes value-preserving — DuckDB reads
    * the same naive micros, so oracle comparisons stay exact.
    */
  def events: DataFrame = {
    val raw = t("events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
