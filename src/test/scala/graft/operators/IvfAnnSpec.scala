package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IvfAnnSpec extends SparkSpec {
  import spark.implicits._

  // 3 well-separated clusters in 16-d
  private lazy val vecs = {
    val rng = new scala.util.Random(11)
    val centers = Seq.fill(3)(Array.fill(16)(rng.nextGaussian().toFloat * 3))
    (0 until 120).map { i =>
      val c = centers(i % 3)
      (i.toLong, c.map(x => x + 0.1f * rng.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
  }

  test("k-means centroids land one per cluster (S3 quantizer)") {
    val cents = IvfAnn.trainCentroids(vecs, "embedding", k = 3, iters = 6)
    cents.length shouldBe 3
    // each true cluster should have exactly one nearest centroid
    val assignments = vecs.collect().map { r =>
      val v = r.getSeq[Float](1).map(_.toDouble).toArray
      def cos(a: Array[Double], b: Array[Double]) = {
        val d = a.zip(b).map { case (x, y) => x * y }.sum
        d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      }
      (r.getLong(0) % 3) -> cents.zipWithIndex.maxBy { case (c, _) => cos(v, c) }._2
    }
    assignments.groupBy(_._1).values.foreach { cluster =>
      cluster.map(_._2).distinct.length shouldBe 1 // cluster-pure assignment
    }
    assignments.map(_._2).distinct.length shouldBe 3 // no two clusters share a centroid
  }

  test("sample-trained quantizer keeps cluster-pure assignments (S3 at scale)") {
    // sampleCap below the corpus size forces the deterministic hash sample;
    // a representative sample must yield centroids that still separate the
    // three true clusters — the property the 100 TB training path rests on
    val cents = IvfAnn.trainCentroids(vecs, "embedding", k = 3, iters = 6, sampleCap = 60)
    cents.length shouldBe 3
    val assignments = vecs.collect().map { r =>
      val v = r.getSeq[Float](1).map(_.toDouble).toArray
      def cos(a: Array[Double], b: Array[Double]) = {
        val d = a.zip(b).map { case (x, y) => x * y }.sum
        d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      }
      (r.getLong(0) % 3) -> cents.zipWithIndex.maxBy { case (c, _) => cos(v, c) }._2
    }
    assignments.groupBy(_._1).values.foreach { cluster =>
      cluster.map(_._2).distinct.length shouldBe 1
    }
    assignments.map(_._2).distinct.length shouldBe 3
    // determinism: the same cap re-trains to the same centroids
    val again = IvfAnn.trainCentroids(vecs, "embedding", k = 3, iters = 6, sampleCap = 60)
    again.zip(cents).foreach { case (a, b) => a.toSeq shouldBe b.toSeq }
  }

  test("IVF top-k reaches high recall vs brute force (S3)") {
    val cents   = IvfAnn.trainCentroids(vecs, "embedding", k = 3, iters = 6)
    val queries = vecs.filter(col("vec_id") < 9)
    val exact = Similarity.bruteForceTopK(queries, vecs, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = IvfAnn.topK(queries, vecs, "vec_id", "embedding", cents, k = 5, nprobe = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect ivf).size.toDouble / exact.size
    recall should be >= 0.9 // separated clusters: nprobe=1 already suffices
  }

  test("knnJoin at full probe ≡ brute force for every left row (S14)") {
    val rng = new scala.util.Random(23)
    val right = (0 until 300).map(i => (i.toLong, Seq.fill(16)(rng.nextGaussian())))
      .toDF("vec_id", "embedding")
    val left = (1000 until 1200).map(i => (i.toLong, Seq.fill(16)(rng.nextGaussian())))
      .toDF("vec_id", "embedding")
    val got = IvfAnn.knnJoin(left, right, "vec_id", "vec_id", "embedding",
        k = 3, cells = 4, nprobe = 4, knownN = 300)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val expect = Similarity.bruteForceTopK(left, right, "vec_id", "embedding", k = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    got shouldBe expect
    got.map(_._1) shouldBe (1000L until 1200L).toSet // EVERY left row answered
  }

  test("knnJoin plans an equi-join on the cell id — never a cartesian/nested loop (S14)") {
    val rng = new scala.util.Random(31)
    val right = (0 until 200).map(i => (i.toLong, Seq.fill(16)(rng.nextGaussian())))
      .toDF("vec_id", "embedding")
    val left = (1000 until 1100).map(i => (i.toLong, Seq.fill(16)(rng.nextGaussian())))
      .toDF("vec_id", "embedding")
    val plan = IvfAnn.knnJoin(left, right, "vec_id", "vec_id", "embedding",
        k = 3, cells = 4, nprobe = 2, knownN = 200)
      .queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
  }

  test("quantized knnJoin: covering shortlist ≡ exact knnJoin; full probe too ≡ brute force (S17)") {
    val rng = new scala.util.Random(37)
    val right = (0 until 300).map(i => (i.toLong, Seq.fill(16)(rng.nextGaussian())))
      .toDF("vec_id", "embedding")
    val left = (1000 until 1150).map(i => (i.toLong, Seq.fill(16)(rng.nextGaussian())))
      .toDF("vec_id", "embedding")
    // shortlist ≥ |right| covers every in-cell candidate → the quantized
    // scan cannot lose anything the exact join would keep
    val quantFull = IvfAnn.knnJoinQuantized(left, right, "vec_id", "vec_id",
        "embedding", k = 3, cells = 4, nprobe = 4, shortlist = 300, knownN = 300)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val brute = Similarity.bruteForceTopK(left, right, "vec_id", "embedding", k = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    quantFull shouldBe brute
    val quantProbe = IvfAnn.knnJoinQuantized(left, right, "vec_id", "vec_id",
        "embedding", k = 3, cells = 4, nprobe = 2, shortlist = 300, knownN = 300)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exactProbe = IvfAnn.knnJoin(left, right, "vec_id", "vec_id", "embedding",
        k = 3, cells = 4, nprobe = 2, knownN = 300)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    quantProbe shouldBe exactProbe
  }

  test("quantized knnJoin: planted copies head the shortlist and re-rank to top-1 (S17)") {
    val rng = new scala.util.Random(41)
    val base = (0 until 200).map(i => (i.toLong, Seq.fill(16)(rng.nextGaussian())))
    val planted = (base ++ base.map { case (i, v) => (i + 1000L, v) })
      .toDF("vec_id", "embedding")
    val top1 = IvfAnn.knnJoinQuantized(base.toDF("vec_id", "embedding"), planted,
        "vec_id", "vec_id", "embedding",
        k = 1, cells = 4, nprobe = 2, shortlist = 8, excludeSelf = true, knownN = 400)
      .select("query_id", "neighbor_id", "cosine")
      .as[(Long, Long, Double)].collect()
    top1.length shouldBe 200
    top1.foreach { case (q, nb, cos) =>
      nb shouldBe q + 1000L
      cos shouldBe 1.0 +- 1e-9
    }
  }

  test("knnJoin self-join: excludeSelf drops the trivial match, copies surface at top-1 (S14)") {
    val rng = new scala.util.Random(29)
    val base = (0 until 200).map(i => (i.toLong, Seq.fill(16)(rng.nextGaussian())))
    val planted = (base ++ base.map { case (i, v) => (i + 1000L, v) })
      .toDF("vec_id", "embedding")
    val top1 = IvfAnn.knnJoin(base.toDF("vec_id", "embedding"), planted,
        "vec_id", "vec_id", "embedding",
        k = 1, cells = 4, nprobe = 2, excludeSelf = true, knownN = 400)
      .select("query_id", "neighbor_id", "cosine")
      .as[(Long, Long, Double)].collect()
    top1.length shouldBe 200
    top1.foreach { case (q, nb, cos) =>
      nb shouldBe q + 1000L
      cos shouldBe 1.0 +- 1e-9
    }
  }
}
