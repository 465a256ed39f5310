package graft.operators

import org.apache.spark.sql.functions._

/** Dev tool: measure LSH-ANN recall vs the exact S1 scan on the natural
  * embeddings corpus per SF dir, across (tables, targetBucket) settings —
  * the evidence behind the s2_recall gate's threshold. */
object AnnRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    for (dir <- dirs) {
      val base = graft.Tables(spark, dir).embeddings
      val n = base.count()
      val vecs = base.repartition(32)
      val queries = vecs.filter(col("vec_id") < 32)
      val exact = Similarity.bruteForceTopK(queries, vecs, "vec_id", "embedding", k = 10)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // planned config first (the production path), then fixed-table rows
      // for comparison against the planner's choice
      val plan = Similarity.lshPlan(n, dim = 64, k = 10)
      val planned = Similarity.lshTopK(queries, vecs, "vec_id", "embedding", k = 10, knownN = n)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val plannedRecall = (exact intersect planned).size.toDouble / exact.size
      println(f"[annrecall] $dir n=$n lsh planned bits=${plan.bits} r=${plan.radius} " +
        f"tables=${plan.tables} predicted=${plan.predictedRecall}%.4f recall=$plannedRecall%.4f")
      for (tables <- Seq(4, 8)) {
        val approx = Similarity.lshTopK(queries, vecs, "vec_id", "embedding", k = 10,
            tables = tables, knownN = n)
          .select("query_id", "neighbor_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val recall = (exact intersect approx).size.toDouble / exact.size
        println(f"[annrecall] $dir n=$n lsh tables=$tables recall=$recall%.4f")
      }
      for ((k, nprobe) <- Seq((8, 2), (8, 3), (16, 4))) {
        val cents = IvfAnn.trainCentroids(vecs, "embedding", k = k, iters = 3, knownN = n)
        val approx = IvfAnn.topK(queries, vecs, "vec_id", "embedding", cents,
            k = 10, nprobe = nprobe)
          .select("query_id", "neighbor_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val recall = (exact intersect approx).size.toDouble / exact.size
        println(f"[annrecall] $dir n=$n ivf k=$k nprobe=$nprobe recall=$recall%.4f")
      }
      // S6 IVF-PQ: same cells/nprobe as the s3 gate row, plus shortlist —
      // with exact re-rank the gap to the ivf row above isolates ADC
      // shortlist loss (true neighbors pushed below `shortlist` by
      // quantization noise)
      for ((m, pk, shortlist) <- Seq((4, 16, 128), (8, 16, 128), (8, 64, 128), (8, 256, 128), (8, 64, 64))) {
        val index = IvfPq.build(vecs, "embedding", cells = 8, m = m, k = pk,
          knownN = n)
        val enc = IvfPq.encode(vecs, "vec_id", "embedding", index)
        val approx = IvfPq.search(queries, enc, vecs, "vec_id", "embedding", index,
            k = 10, nprobe = 3, shortlist = shortlist)
          .select("query_id", "neighbor_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val recall = (exact intersect approx).size.toDouble / exact.size
        println(f"[annrecall] $dir n=$n ivfpq cells=8 nprobe=3 m=$m k=$pk " +
          f"shortlist=$shortlist recall=$recall%.4f")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
