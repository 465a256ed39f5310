package graft.operators

/** Dev tool: verify the d2/d3 planted-pair recall gates are exact at a
  * given SF dir — the oracles assert EVERY planted pair is recovered, so
  * this must print `d2=docs` and `d3=docs` before the gate ships. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    for (dir <- dirs) {
      val nDocs = graft.Tables(spark, dir).documents.count()
      val d2 = LlmOps.queries("d2_minhash_lsh")(spark, dir).count()
      val d3 = LlmOps.queries("d3_simhash")(spark, dir).count()
      println(s"[recall] $dir docs=$nDocs d2_planted=$d2 d3_planted=$d3 " +
        s"${if (d2 == nDocs && d3 == nDocs) "OK" else "MISMATCH"}")
      LlmOps.clearPlanted()
      Caches.releaseAll()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
