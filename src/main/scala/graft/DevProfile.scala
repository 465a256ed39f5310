package graft

import org.apache.spark.sql.functions._

/** Dev tool: stage-by-stage timing of the heavy dedup operators at a given
  * scale factor — finds which shuffle/projection dominates before any plan
  * surgery. Not part of the gate surface.
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.DevProfile /root/testdata/sf0.1
  */
object DevProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local()
    import graft.operators._

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r  = f
      println(f"[profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // planted corpus identical to the d4 gate
    val docs = Tables(spark, sfDir).documents.select("doc_id", "text").repartition(32)
    val corpus = docs.unionAll(docs.select((col("doc_id") + 1000000L).as("doc_id"),
      expr("substring(text, 1, greatest(20, int(length(text) * 0.9)))").as("text")))

    timed("corpus count") { corpus.count() }

    val sets = Caches.owned(Dedup.shingleSets(corpus, "text", "doc_id", 3))
    timed("shingleSets materialize") { sets.count() }

    val ex = sets.select(col("id"), explode(col("__set")).as("sh"), size(col("__set")).as("sz"))
    timed("explode count") { ex.count() }

    val dfreq = ex.groupBy("sh").agg(count(lit(1)).as("__df"))
    timed("dfreq") { dfreq.count() }

    val ranked = ex.join(dfreq, Seq("sh"))
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("id")
          .orderBy(col("__df"), col("sh"))))
    val prefix = ranked
      .filter(col("__rn") <= col("sz") - ceil(lit(0.5) * col("sz") - lit(1e-9)) + 1)
      .select("sh", "id", "sz", "__rn")
    timed("prefix (join+window+filter)") { prefix.count() }

    // mirrors ngramJaccardDedup's PPJoin pruning — keep in sync
    val t = 0.5
    val pa = prefix.select(col("sh"), col("id").as("id_a"), col("sz").as("sz_a"), col("__rn").as("rn_a"))
    val pb = prefix.select(col("sh"), col("id").as("id_b"), col("sz").as("sz_b"), col("__rn").as("rn_b"))
    val pairs = pa.join(pb, Seq("sh"))
      .filter(col("id_a") < col("id_b"))
      .filter(col("sz_a") >= lit(t) * col("sz_b") - lit(1e-9) &&
        col("sz_b") >= lit(t) * col("sz_a") - lit(1e-9))
      .filter(lit(1) + least(col("sz_a") - col("rn_a"), col("sz_b") - col("rn_b")) >=
        ceil(lit(t / (1.0 + t)) * (col("sz_a") + col("sz_b")) - lit(1e-9)))
      .select("id_a", "id_b")
      .distinct()
    timed("candidate pairs") { println("  pairs=" + pairs.count()) }

    val verified = Dedup.jaccardVerifySets(pairs, sets).filter(col("jaccard") >= 0.5)
    timed("verify join") { println("  verified=" + verified.count()) }

    timed("d4 end-to-end (fresh)") {
      Caches.releaseAll(); spark.catalog.clearCache()
      Dedup.ngramJaccardDedup(corpus, "text", "doc_id", threshold = 0.5).count()
    }
    spark.stop()
  }
}
