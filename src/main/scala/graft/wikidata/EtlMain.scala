package graft.wikidata

import graft.GraftSession

/** CLI parity with the reference (`wd2sql <JSON_FILE> <SQLITE_FILE>`,
  * reference: src/main.rs:35-40,95-255): transform a Wikidata JSON dump into
  * the 8 normalized tables, here as partitioned+sorted parquet instead of
  * SQLite (the 100 TB-appropriate sink).
  *
  * Usage: EtlMain <dump.json or directory of shards> <output dir> [partitions]
  */
/** Throttled cumulative input-row progress off task metrics. */
final class ProgressListener(t0: Long)
    extends org.apache.spark.scheduler.SparkListener {
  private val rows = new java.util.concurrent.atomic.AtomicLong
  @volatile private var lastPrint = 0L
  override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
    val metrics = e.taskMetrics
    if (metrics != null) {
      val n   = rows.addAndGet(metrics.inputMetrics.recordsRead)
      val now = System.nanoTime()
      if (now - lastPrint > 1000000000L) {
        lastPrint = now
        println(f"  [${(now - t0) / 1e9}%7.1f s] ...$n%,d input rows read")
      }
    }
  }
}

object EtlMain {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: EtlMain <json dump path> <output dir> [partitions]")
      sys.exit(2)
    }
    val Array(dumpPath, outDir) = args.take(2)
    val partitions = if (args.length > 2) args(2).toInt else 0
    if (java.nio.file.Files.exists(java.nio.file.Paths.get(outDir))) {
      // match the reference's refuse-to-overwrite contract (src/main.rs:98-104)
      System.err.println(s"The output '$outDir' already exists. Choose a new directory.")
      sys.exit(1)
    }
    val spark = GraftSession.local()
    val t0    = System.nanoTime()
    def mark(label: String): Unit =
      println(f"  [${(System.nanoTime() - t0) / 1e9}%7.1f s] $label")
    // per-entity progress (reference prints every N entities,
    // src/main.rs:108-118): task input-record counts via a listener — free,
    // no per-row instrumentation in the job itself
    val progress = new ProgressListener(t0)
    spark.sparkContext.addSparkListener(progress)
    val tables = WikidataEtl.run(DumpReader.read(spark, dumpPath))
    mark("plan built")
    tables.core.foreach(_.count()) // shared parse cache (idempotent with writeParquet's own materialize)
    mark("parse cached")
    tables.writeParquet(outDir, partitions)
    tables.unpersist()
    spark.sparkContext.removeSparkListener(progress)
    mark("tables written")
    val counts = tables.byName.map { case (n, _) =>
      n -> spark.read.parquet(s"$outDir/$n").count()
    }
    mark("counts")
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"wrote ${counts.values.sum} rows across ${counts.size} tables in $secs%.1f s")
    counts.toSeq.sortBy(_._1).foreach { case (n, c) => println(f"  $n%-12s $c%d") }
    spark.stop()
  }
}
