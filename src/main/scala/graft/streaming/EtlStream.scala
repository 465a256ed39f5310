package graft.streaming

import graft.wikidata.{DumpReader, WikidataEtl}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Continuous dump ingestion — the reference's `bzcat dump.bz2 | wd2sql -`
  * stdin mode (reference: src/main.rs:122-137) as Structured Streaming:
  * watch a directory for dump shards as they land, run the identical ETL
  * column algebra per micro-batch, append to the same 8 parquet tables.
  *
  * `foreachBatch` is the idiomatic multi-sink pattern: one checkpointed
  * stream, eight appends per batch off one cached claim core — exactly the
  * batch pipeline's shape, so batch and streaming cannot drift.
  */
object EtlStream {

  def start(spark: SparkSession, inDir: String, outDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val entities = DumpReader.entities(spark.readStream.text(inDir))
    entities.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val tables = WikidataEtl.run(batch.toDF())
        try tables.byName.foreach { case (name, df) =>
          df.write.mode("append").parquet(s"$outDir/$name")
        } finally tables.unpersist() // bounded memory across micro-batches
      }
      .start()
  }
}
