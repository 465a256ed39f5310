package graft.operators

import graft.SparkSpec

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  test("compact bin-packs small files to ~target size without a shuffle (R26)") {
    val frag = java.nio.file.Files.createTempDirectory("cspec_frag").toString
    val out  = java.nio.file.Files.createTempDirectory("cspec_out").toString
    val rows = (1L to 50000L).map(i => (i, s"payload_$i"))
    rows.toDF("id", "s").repartition(64).write.mode("overwrite").parquet(frag)

    val fs = new org.apache.hadoop.fs.Path(frag)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def nFiles(dir: String): Int =
      fs.listStatus(new org.apache.hadoop.fs.Path(dir))
        .count(_.getPath.getName.endsWith(".parquet"))
    nFiles(frag) shouldBe 64

    val written = Compaction.compact(spark, frag, out, targetBytes = 512L * 1024 * 1024)
    written shouldBe nFiles(out)
    // everything fits one target-sized bin → one file
    written shouldBe 1

    // round trip is exact
    val back = spark.read.parquet(out).as[(Long, String)].collect().sorted
    back shouldBe rows.sorted.toArray

    // session confs restored
    spark.conf.getOption("spark.sql.files.maxPartitionBytes")
      .getOrElse("134217728") should not be "536870912"
  }

  test("compact splits into multiple bins when the data exceeds the target (R26)") {
    val frag = java.nio.file.Files.createTempDirectory("cspec_frag2").toString
    val out  = java.nio.file.Files.createTempDirectory("cspec_out2").toString
    (1L to 40000L).map(i => (i, ("x" * 200) + i)).toDF("id", "s")
      .repartition(32).write.mode("overwrite").parquet(frag)
    // target holds a few input files per bin: forces >1 output file but
    // still packs several inputs into each
    val written = Compaction.compact(spark, frag, out, targetBytes = 1024L * 1024)
    written should be > 1
    written should be < 32
    spark.read.parquet(out).count() shouldBe 40000L
  }
}
