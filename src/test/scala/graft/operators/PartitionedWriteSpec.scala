package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PartitionedWriteSpec extends SparkSpec {
  import spark.implicits._

  test("hive-partitioned layout prunes at the directory level (R28)") {
    val out = java.nio.file.Files.createTempDirectory("pwspec").toString
    val rows = Seq.tabulate(1000)(i => (i.toLong, s"text $i", if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "fr"))
    rows.toDF("id", "text", "lang")
      .repartition(4).write.mode("overwrite").partitionBy("lang").parquet(out)

    val back = spark.read.parquet(out)
    // partition column restored from directory names, values intact
    back.count() shouldBe 1000
    back.filter(col("lang") === "en").count() shouldBe rows.count(_._3 == "en")

    // pruning: the filtered scan lists only the lang=en directory's files —
    // asserted on the scan's RUNTIME numFiles metric (inputFiles reports
    // the relation's full listing, pre-pruning)
    val filtered = back.filter(col("lang") === "en").select("id")
    filtered.queryExecution.executedPlan.toString should include ("PartitionFilters")
    filtered.collect()
    val scan = filtered.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    val enFiles = back.inputFiles.count(_.contains("lang=en"))
    val totalFiles = back.inputFiles.length
    scan.metrics("numFiles").value shouldBe enFiles
    enFiles should be < totalFiles
  }
}
