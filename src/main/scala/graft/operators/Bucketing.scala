package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed managed tables: pre-shuffle once at write time so every later
  * join/aggregation on the bucket key is co-located and shuffle-free — the
  * standard way a 100 TB fact table avoids re-shuffling per query.
  */
object Bucketing {

  /** Write `df` as a parquet-backed managed table bucketed (and sorted)
    * on `key`. Joins between tables bucketed the same way skip Exchange. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .mode("overwrite")
      .saveAsTable(table)

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
