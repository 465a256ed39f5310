package graft.operators

import graft.Tables
import org.apache.spark.sql.functions._

/** Dev tool: time the d2 pipeline stage by stage at a given SF dir. */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val dir   = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = Tables(spark, dir).documents.select("doc_id", "text").repartition(32)
    val planted = docs.unionAll(
      docs.select((col("doc_id") + 1000000L).as("doc_id"),
        expr("substring(text, 1, greatest(20, int(length(text) * 0.9)))").as("text")))
    time("planted count")(planted.count())
    val sets = Dedup.shingleSets(planted, "text", "doc_id")
    time("shingleSets count")(sets.count())
    time("shingle hashes sum")(sets.select(explode(col("__set"))).count())
    val sigs = sets.select(col("id"),
      Dedup.minhashSignatureOver(col("__set"), 64).as("sig"))
    time("minhash sigs count")(sigs.count())
    val persisted = sigs.persist()
    time("sigs persist materialize")(persisted.count())
    time("full minhashLsh")(Dedup.minhashLsh(planted, "text", "doc_id", threshold = 0.5).count())
    time("full minhashLsh again")(Dedup.minhashLsh(planted, "text", "doc_id", threshold = 0.5).count())
    spark.stop()
  }
}
