package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** S3 scale-invariance, the IVF counterpart of AnnScaleSpec: the sizing rule
  * must hold recall as the corpus grows (cells ~ sqrt(n), nprobe a constant
  * fraction of cells), and the planned configuration must measure at least
  * as well as the fixed gate config at both test SFs with no cross-SF decay.
  * The isotropic corpus is IVF's WORST case (s3_recall's rationale), so the
  * absolute bound here is the gate's 0.55, not LSH's 0.9.
  */
class IvfScaleSpec extends SparkSpec {

  test("IVF plan law: cells ~ sqrt(n), probed fraction constant, caps hold (S3)") {
    val plans = Seq(1e3, 1e4, 1e6, 1e8, 1e10).map { n =>
      val p = IvfAnn.ivfPlan(n.toLong)
      withClue(s"n=$n plan=$p: ") {
        p.cells should be <= 4096
        p.cells should be >= 8
        // probed corpus fraction = nprobe/cells stays in a fixed band —
        // this is the recall invariant (a fixed nprobe would vanish)
        val frac = p.nprobe.toDouble / p.cells
        frac should be >= 0.3
        frac should be <= 0.5
        if (n >= 1e4 && n <= 4096.0 * 4096.0) {
          p.cells shouldBe math.ceil(math.sqrt(n)).toInt
        }
      }
      p
    }
    plans.sliding(2).foreach { case Seq(a, b) => b.cells should be >= a.cells }
  }

  test("planned IVF recall >= 0.55 at sf0.001 and sf0.1 and does not decay across 100x (S3)") {
    val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.1")
    assume(dirs.forall(d => new java.io.File(d).exists()), "testdata not present")
    val recalls = dirs.map { dir =>
      val base = graft.Tables(spark, dir).embeddings
      val n = base.count()
      val plan = IvfAnn.ivfPlan(n)
      val queries = base.filter(col("vec_id") < 32)
      val cents = IvfAnn.trainCentroids(base, "embedding", k = plan.cells, iters = 3, knownN = n)
      val exact = Similarity.bruteForceTopK(queries, base, "vec_id", "embedding", k = 10)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val approx = IvfAnn.topK(queries, base, "vec_id", "embedding", cents,
          k = 10, nprobe = plan.nprobe)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (exact intersect approx).size.toDouble / exact.size
      info(f"$dir n=$n cells=${plan.cells} nprobe=${plan.nprobe} recall=$recall%.4f")
      recall
    }
    recalls.foreach(_ should be >= 0.55)
    recalls(1) should be >= recalls(0) - 0.05
  }

  test("probe path has no Window node (S3 scale shape)") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(dir).exists(), "testdata not present")
    val base = graft.Tables(spark, dir).embeddings
    val cents = IvfAnn.trainCentroids(base, "embedding", k = 8, iters = 1, knownN = 500L)
    val df = IvfAnn.topK(base.filter(col("vec_id") < 3), base, "vec_id", "embedding", cents, k = 5, nprobe = 3)
    val plan = df.queryExecution.executedPlan.toString
    plan should include("TopKPerGroup")
    (plan should not).include("Window")
  }
}
