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

  /** `writeBucketed` that first clears both the catalog entry AND any stale
    * warehouse location a previous session left behind (a managed table's
    * directory survives `spark.stop()`, and `saveAsTable` refuses to reuse
    * it even in overwrite mode when the table is absent from this session's
    * catalog). */
  def writeBucketedFresh(spark: SparkSession, df: DataFrame, table: String,
      key: String, buckets: Int): Unit = {
    // the stale-location path below assumes <warehouse>/<table> — only true
    // for unqualified names in the default database (db.table lives at
    // <warehouse>/<db>.db/<table>, and deleting the wrong path would not fix
    // the stale directory saveAsTable trips on)
    require(!table.contains("."),
      s"writeBucketedFresh requires an unqualified default-database table name, got '$table'")
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    val p  = new org.apache.hadoop.fs.Path(wh, table.toLowerCase)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    writeBucketed(df, table, key, buckets)
  }
}
