package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** S8: filtered ANN — brute path exactness, full-probe IVF path ≡
  * filtered ground truth, predicate hygiene on both paths, routing and
  * nprobe-inflation laws. */
class FilteredAnnSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(seed: Int, n: Int, dim: Int = 12)
      : Seq[(Long, Seq[Double], Long)] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i =>
      (i.toLong, Seq.fill(dim)(rnd.nextGaussian()), (i % 10).toLong))
  }

  private def df(rows: Seq[(Long, Seq[Double], Long)]) =
    rows.toDF("vec_id", "embedding", "label")

  test("selective predicate routes to the exact scan and equals filtered brute force (S8)") {
    val rows = corpus(1, 2000)
    val all = df(rows)
    val queries = all.filter(col("vec_id") < 8)
    val pred = col("label") === 3 && col("vec_id") % 7 === 0 // ~1.4%
    FilteredAnn.useBrute(0.014) shouldBe true
    val got = FilteredAnn.topK(queries, all, "vec_id", "embedding", pred,
        k = 5, centroids = Seq.empty, nprobe = 3, selectivity = 0.014)
      .select("query_id", "neighbor_id", "cosine")
      .as[(Long, Long, Double)].collect().toSeq.sorted
    val want = Similarity.bruteForceTopK(queries, all.filter(pred),
        "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id", "cosine")
      .as[(Long, Long, Double)].collect().toSeq.sorted
    got shouldBe want
  }

  test("IVF path at full probe equals filtered brute force (S8)") {
    val rows = corpus(5, 1500)
    val all = df(rows)
    val queries = all.filter(col("vec_id") < 8)
    val pred = col("label") < 5
    val cents = IvfAnn.trainCentroids(all, "embedding", k = 6, iters = 2,
      knownN = rows.size)
    // selectivity 0.5, nprobe 12 → inflation caps at all 6 cells = exact
    FilteredAnn.inflatedNprobe(12, 6, 0.5) shouldBe 6
    val got = FilteredAnn.topK(queries, all, "vec_id", "embedding", pred,
        k = 5, centroids = cents, nprobe = 12, selectivity = 0.5)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSeq.sorted
    val want = Similarity.bruteForceTopK(queries, all.filter(pred),
        "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSeq.sorted
    got shouldBe want
  }

  test("no predicate-excluded row ever surfaces, on either path (S8)") {
    val rows = corpus(9, 1200)
    val all = df(rows)
    val queries = all.filter(col("vec_id") < 10)
    val pred = col("label") % 2 === 0
    val cents = IvfAnn.trainCentroids(all, "embedding", k = 6, iters = 2,
      knownN = rows.size)
    val allowed = rows.filter(_._3 % 2 == 0).map(_._1).toSet
    for (sel <- Seq(0.01, 0.5)) {
      val ids = FilteredAnn.topK(queries, all, "vec_id", "embedding", pred,
          k = 8, centroids = cents, nprobe = 2, selectivity = sel)
        .select("neighbor_id").as[Long].collect()
      ids.foreach(id => allowed should contain(id))
    }
  }

  test("routing threshold and inflation laws (S8)") {
    FilteredAnn.useBrute(FilteredAnn.BruteCutoff) shouldBe true
    FilteredAnn.useBrute(FilteredAnn.BruteCutoff + 1e-9) shouldBe false
    FilteredAnn.inflatedNprobe(3, 64, 1.0) shouldBe 3
    FilteredAnn.inflatedNprobe(3, 64, 0.5) shouldBe 6
    FilteredAnn.inflatedNprobe(3, 64, 0.1) shouldBe 30
    FilteredAnn.inflatedNprobe(3, 64, 0.001) shouldBe 64 // capped
    // monotone: tighter predicate → never fewer probes
    val probes = Seq(1.0, 0.5, 0.2, 0.1, 0.05)
      .map(FilteredAnn.inflatedNprobe(3, 64, _))
    probes shouldBe probes.sorted
  }
}
