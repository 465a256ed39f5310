package graft

import org.apache.spark.sql.SparkSession

/** Session factory used by tests and benchmarks.
  *
  * Tuned for the container's local[32] mode but with settings that hold on a
  * real cluster: AQE on (runtime re-plan, skew-join splitting), shuffle
  * partitions sized to the parallelism rather than the 200 default.
  */
object GraftSession {
  def local(cpus: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // testdata events.ts is TIMESTAMP(NANOS) parquet; Spark 4 rejects it
      // unless read as raw nanos (Tables.events converts back to timestamp)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .config("spark.sql.warehouse.dir",
        sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft-warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
