package graft.wikidata

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Dev tool: time each ETL phase to find the throughput bottleneck. */
object EtlProbe {
  def main(args: Array[String]): Unit = {
    val path  = args.headOption.getOrElse("/tmp/dump.json")
    val spark = GraftSession.local()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val lines = spark.read.text(path)
    println(s"[probe] partitions: ${lines.rdd.getNumPartitions}")
    time("raw line count")(lines.count())
    // A/B: the pruned from_json parse (production path) vs a full-variant
    // parse. On a dump that is mostly UNCONSUMED bytes (real Wikidata:
    // ~300 languages, sitelinks, references) pruning should win; on the
    // fully-consumed synthetic minidump the variant builder's tight binary
    // encode wins. Run both to keep the decision evidence-based per corpus.
    time("A/B full-variant parse") {
      val trimmed = trim(col("value"))
      lines.filter(trimmed =!= "" && trimmed =!= "[" && trimmed =!= "]")
        .select(try_parse_json(regexp_replace(trimmed, ",$", "")).as("entity"))
        .filter(col("entity").isNotNull).count()
    }
    val parsed = DumpReader.read(spark, path)
    time("parse_json count")(parsed.count())
    time("meta count")(WikidataEtl.meta(parsed).count())
    val core = WikidataEtl.claimCore(parsed)
    time("claimCore count")(core.count())
    time("claimCore agg by type")(core.groupBy("value_type").count().collect())
    val t = WikidataEtl.run(parsed, cache = false)
    time("string table count")(t.string.count())
    time("entity table count")(t.entity.count())
    val cached = WikidataEtl.claimCore(parsed).cache()
    time("core cache materialize")(cached.count())
    // run(cache=true) caches the PARSED structs, not the exploded core —
    // A/B the encode cost of that cache under the columnar-cache knobs
    for ((label, compressed) <- Seq(("compressed", "true"), ("raw", "false"))) {
      spark.conf.set("spark.sql.inMemoryColumnarStorage.compressed", compressed)
      val p = DumpReader.read(spark, path).cache()
      time(s"parsed cache materialize ($label)")(p.count())
      time(s"parsed cache re-read core ($label)")(WikidataEtl.claimCore(p).count())
      p.unpersist(true)
    }
    spark.conf.set("spark.sql.inMemoryColumnarStorage.compressed", "true")
    val t2 = WikidataEtl.run(parsed)
    val out = java.nio.file.Files.createTempDirectory("etlprobe").toString
    time("writeParquet all 8 (shuffled)")(t2.writeParquet(out, 32))
    time("writeParquet all 8 (no shuffle)")(t2.writeParquet(out + "2"))
    spark.stop()
  }
}
