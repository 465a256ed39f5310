package graft.wikidata

import graft.SparkSpec
import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** Piped-stdin ingestion (`wd2sql -` parity): lines fed through an
  * InputStream spool into shards and stream into the 8 tables; the result
  * must match the batch ETL on the same lines. */
class EtlStdinSpec extends SparkSpec {

  private def entityLine(q: Int, label: String): String =
    s"""{"id":"Q$q","type":"item","labels":{"en":{"language":"en","value":"$label"}},"descriptions":{},"claims":{"P31":[{"mainsnak":{"snaktype":"value","property":"P31","datavalue":{"value":"$label-claim","type":"string"}},"type":"statement","rank":"normal"}]}}"""

  test("stdin pipe ingestion matches the batch ETL (CLI `-` mode)") {
    val out = Files.createTempDirectory("etl_stdin_out").toString + "/run"
    val dump = ("[" +: (1 to 25).map(i => entityLine(i, s"label$i") + ",") :+ "]")
      .mkString("\n")
    val in = new ByteArrayInputStream(dump.getBytes(StandardCharsets.UTF_8))

    // tiny shard size forces the multi-shard path
    val n = EtlStdin.run(spark, in, out, shardBytes = 512)
    n shouldBe 27 // 25 entities + the two bracket lines

    val streamedMeta = spark.read.parquet(s"$out/meta")
    streamedMeta.count() shouldBe 25
    spark.read.parquet(s"$out/string").count() shouldBe 25

    val batch = WikidataEtl.run(
      DumpReader.fromLines(spark, dump.split("\n").toSeq), cache = false)
    val streamedSet = streamedMeta.collect().map(_.toSeq).toSet
    val batchSet    = batch.meta.collect().map(_.toSeq).toSet
    streamedSet shouldBe batchSet
  }
}
