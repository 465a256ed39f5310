package graft.streaming

import graft.SparkSpec
import java.nio.file.{Files, Paths}

/** Streaming dump ingestion: shards landing in a watched directory are
  * ETL'd incrementally and accumulate in the same 8 tables. */
class EtlStreamSpec extends SparkSpec {

  private def entityLine(q: Int, label: String): String =
    s"""{"id":"Q$q","type":"item","labels":{"en":{"language":"en","value":"$label"}},"descriptions":{},"claims":{"P31":[{"mainsnak":{"snaktype":"value","property":"P31","datavalue":{"value":{"entity-type":"item","numeric-id":5,"id":"Q5"},"type":"wikibase-entityid"}},"type":"statement","rank":"normal"}]}}"""

  test("dump shards stream into accumulating tables (ETL streaming parity)") {
    val in   = Files.createTempDirectory("etl_stream_in").toString
    val out  = Files.createTempDirectory("etl_stream_out").toString
    val ckpt = Files.createTempDirectory("etl_stream_ckpt").toString

    Files.writeString(Paths.get(in, "shard1.json"),
      Seq("[", entityLine(1, "one") + ",", entityLine(2, "two") + ",", "]").mkString("\n"))
    val q1 = EtlStream.start(spark, in, out, ckpt)
    q1.awaitTermination() // AvailableNow: drains and stops
    spark.read.parquet(s"$out/meta").count() shouldBe 2

    // a new shard lands; the checkpoint ensures only the delta is processed
    Files.writeString(Paths.get(in, "shard2.json"), entityLine(3, "three"))
    val q2 = EtlStream.start(spark, in, out, ckpt)
    q2.awaitTermination()
    val meta = spark.read.parquet(s"$out/meta")
    meta.count() shouldBe 3
    meta.filter("label = 'three'").count() shouldBe 1
    spark.read.parquet(s"$out/entity").count() shouldBe 3
  }
}
