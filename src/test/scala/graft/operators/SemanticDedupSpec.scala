package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** D10: SemDeDup-style cluster-scoped near-dup removal — planted duplicate
  * groups collapse to their minimum id, singletons survive, cells=1
  * equals a global (unblocked) dedup, chains collapse transitively,
  * below-threshold neighbors are kept, partitioning independence. */
class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  /** Random unit-ish vectors; ids `base*10+j` within a group share the
    * group's vector exactly (j = 0..size-1). */
  private def corpus(seed: Int, nGroups: Int, dupEvery: Int, dim: Int = 16)
      : Seq[(Long, Seq[Double])] = {
    val rnd = new scala.util.Random(seed)
    (0 until nGroups).flatMap { g =>
      val v = Seq.fill(dim)(rnd.nextGaussian())
      val size = if (g % dupEvery == 0) 3 else 1
      (0 until size).map(j => (g.toLong * 10 + j, v))
    }
  }

  private def run(rows: Seq[(Long, Seq[Double])], threshold: Double,
      cells: Int): Seq[Long] =
    SemanticDedup.dedup(rows.toDF("id", "v"), "id", "v", threshold, cells,
        knownN = rows.size)
      .select("id").as[Long].collect().toSeq.sorted

  test("exact-copy groups collapse to the min id; singletons survive (D10)") {
    val rows = corpus(1, 200, dupEvery = 4)
    val expected = rows.map(_._1).filter(id => id % 10 == 0).sorted
    run(rows, 0.999, cells = 14) shouldBe expected
  }

  test("cells = 1 equals a global brute-force component dedup (D10)") {
    // near-dups (slightly perturbed copies) + a chain a~b~c where a!~c:
    // with one cell nothing can straddle a boundary, so the survivor set
    // must equal the driver-side transitive closure at the threshold
    val rnd = new scala.util.Random(5)
    val base = (0 until 40).map(g => (g.toLong * 10, Seq.fill(12)(rnd.nextGaussian())))
    val perturbed = base.collect { case (id, v) if id % 30 == 0 =>
      (id + 1, v.map(_ * 1.0000001 + 1e-9))
    }
    val rows = base ++ perturbed
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    // driver-side components over the ≥ threshold graph
    val ids = rows.map(_._1)
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    for ((a, va) <- rows; (b, vb) <- rows if a < b && cos(va, vb) >= 0.9999)
      parent(find(math.max(a, b))) = find(math.min(a, b))
    val expected = ids.filter(i => find(i) == i).sorted
    run(rows, 0.9999, cells = 1) shouldBe expected
  }

  test("below-threshold neighbors are kept (D10)") {
    // two clearly-distinct vectors: nothing collapses at 0.999
    val rows = Seq((1L, Seq(1.0, 0.0, 0.0)), (2L, Seq(0.0, 1.0, 0.0)),
      (3L, Seq(0.9, 0.1, 0.0)))
    run(rows, 0.999, cells = 1) shouldBe Seq(1L, 2L, 3L)
  }

  test("survivors are independent of input partitioning (D10)") {
    val rows = corpus(9, 120, dupEvery = 3)
    val expected = run(rows, 0.999, cells = 11)
    SemanticDedup.dedup(rows.toDF("id", "v").repartition(13), "id", "v",
        0.999, cells = 11, knownN = rows.size)
      .select("id").as[Long].collect().toSeq.sorted shouldBe expected
  }
}
