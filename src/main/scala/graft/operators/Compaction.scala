package graft.operators

import org.apache.spark.sql.SparkSession

/** Small-file compaction (SURVEY.md §2.2 R26) — the maintenance operation
  * every long-lived parquet dataset needs: streaming sinks, frequent small
  * appends and over-parallel writers leave thousands of KB-scale files, and
  * at 100 TB the resulting driver listing cost + per-file open cost + lost
  * row-group pruning dominate query time long before data volume does.
  *
  * Spark-first shape: the FileSourceScan's own split bin-packing IS the
  * compactor. With `spark.sql.files.maxPartitionBytes` set to the target
  * file size (and `openCostInBytes` accounting for per-file overhead), the
  * scan packs many small files into ~target-sized partitions by byte size —
  * so read → write with NO shuffle and NO repartition emits ~target-sized
  * files: each task streams its input files into one output file.
  * Delta/Iceberg OPTIMIZE does the same bin-pack-then-rewrite; here it is
  * expressed with zero custom machinery.
  */
object Compaction {

  /** Rewrite the parquet directory `inDir` into ~`targetBytes` files at
    * `outDir`. Returns the number of files written. Sort order within each
    * input file survives (tasks stream files in order), so row-group stats
    * stay as tight as the input layout allows; re-cluster with
    * `ZOrder.writeClustered` instead when the layout itself is the problem. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long = 128L * 1024 * 1024): Int = {
    withBinPackedScan(spark, targetBytes) {
      spark.read.parquet(inDir).write.mode("overwrite").parquet(outDir)
    }
    val fs = new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(outDir))
      .count(s => s.getPath.getName.endsWith(".parquet"))
  }

  /** Run `f` with the scan conf tuned so parquet scans bin-pack whole input
    * files into ~`targetBytes` partitions, restoring the prior conf after.
    * minPartitionNum defaults to the session parallelism, which FLOORS the
    * partition count — the scan would split the bins right back apart to
    * keep every core busy. Correct for queries, wrong for compaction: set
    * it to 1 so bins are sized purely by targetBytes (parallelism then
    * comes from the number of bins, which is what compaction wants).
    * Shared with R41's snapshot OPTIMIZE, whose commit-side write runs
    * inside this window. */
  def withBinPackedScan[T](spark: SparkSession, targetBytes: Long)(f: => T): T = {
    val conf = spark.conf
    val saved = Seq("spark.sql.files.maxPartitionBytes",
        "spark.sql.files.openCostInBytes", "spark.sql.files.minPartitionNum")
      .map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.files.maxPartitionBytes", targetBytes.toString)
      // openCost pads each file's bin share (seek + footer overhead); it
      // must stay well under the bin size or nothing can share a bin
      conf.set("spark.sql.files.openCostInBytes",
        math.min(4L * 1024 * 1024, targetBytes / 16).toString)
      conf.set("spark.sql.files.minPartitionNum", "1")
      f
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
