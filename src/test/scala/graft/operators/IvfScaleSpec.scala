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
        // the cap is no longer the flat-scan bound (4096): past
        // FlatScanCap cells topK assigns through the two-level kernel,
        // so cells keep following sqrt(n) to 2^20
        p.cells should be <= (1 << 20)
        p.cells should be >= 8
        // probed corpus fraction = nprobe/cells stays in a fixed band —
        // this is the recall invariant (a fixed nprobe would vanish)
        val frac = p.nprobe.toDouble / p.cells
        frac should be >= 0.3
        frac should be <= 0.5
        if (n >= 1e4 && n <= 1024.0 * 1024.0 * 1024.0 * 1024.0) {
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

  test("hier kernel: full super-probe EXACTLY reproduces the flat kernel; planned probe finds the planted cell") {
    import graft.functions.{TopCentroids, TopCentroidsHier}
    val rnd = new scala.util.Random(12345)
    val dim = 16
    val cents: Array[Array[Double]] = Array.fill(5000)(Array.fill(dim)(rnd.nextGaussian()))
    val (supSeq, memSeq) = IvfAnn.coarsen(cents.toSeq)
    val sup = supSeq.toArray
    val mem = memSeq.toArray
    // membership PARTITIONS the codebook — full-probe exactness depends on it
    mem.map(_.length).sum shouldBe 5000
    mem.flatten.toSet.size shouldBe 5000
    // degradation contract: probing every super-cell scans every cell once,
    // and the explicit (sim desc, cid asc) tie-break makes the result
    // bit-identical to the flat kernel — hier degrades to flat, never to
    // something third
    for (_ <- 0 until 50) {
      val v = Array.fill(dim)(rnd.nextGaussian())
      TopCentroidsHier.top(v, sup, mem, cents, sup.length, 5).toSeq shouldBe
        TopCentroids.top(v, cents, 5).toSeq
    }
    // assignment quality at the planned sprobe: a query sitting next to a
    // centroid must find that centroid's cell through the coarse level
    val sp = math.max(2, math.ceil(sup.length * 0.5).toInt)
    val hits = (0 until 200).count { _ =>
      val c = rnd.nextInt(5000)
      val v = cents(c).map(x => x + 0.05 * rnd.nextGaussian())
      TopCentroidsHier.top(v, sup, mem, cents, sp, 1).head ==
        TopCentroids.top(v, cents, 1).head
    }
    hits.toDouble / 200 should be >= 0.9
  }

  test("topK hier path at full super-probe ≡ flat path end to end (S3 assignment exactness)") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(dir).exists(), "testdata not present")
    val base = graft.Tables(spark, dir).embeddings
    val queries = base.filter(col("vec_id") < 8)
    val cents = IvfAnn.trainCentroids(base, "embedding", k = 23, iters = 2, knownN = 500L)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "cosine").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val flat = rows(IvfAnn.topK(queries, base, "vec_id", "embedding", cents, k = 5, nprobe = 8))
    // flatScanCap = 1 forces the two-level kernel on the same 23-cell
    // codebook; sprobe >= superK probes every super-cell → must be
    // identical (same assignment, same probe set, same cosine bits)
    val hier = rows(IvfAnn.topK(queries, base, "vec_id", "embedding", cents,
      k = 5, nprobe = 8, sprobe = 23, flatScanCap = 1))
    hier shouldBe flat
  }

  test("hier-assigned Lloyd training still yields a working quantizer (S3 training path)") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(dir).exists(), "testdata not present")
    val base = graft.Tables(spark, dir).embeddings
    val queries = base.filter(col("vec_id") < 16)
    // flatScanCap = 1 forces every Lloyd iteration through the two-level
    // assignment; the trained quantizer must still separate the corpus
    // well enough for planned-nprobe recall (same 0.55 isotropic bound as
    // the cross-SF test — approximate training assignment may cost a
    // little recall but must not break the quantizer)
    val cents = IvfAnn.trainCentroids(base, "embedding", k = 23, iters = 3,
      knownN = 500L, flatScanCap = 1)
    cents.length shouldBe 23
    val exact = Similarity.bruteForceTopK(queries, base, "vec_id", "embedding", k = 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = IvfAnn.topK(queries, base, "vec_id", "embedding", cents, k = 10, nprobe = 9)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(f"hier-trained recall=$recall%.4f")
    recall should be >= 0.55
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

  test("coarsen drops empty super-cells: every returned super has members (S3 ANSI safety)") {
    // a near-degenerate codebook (many duplicated centroids plus a handful
    // of distinct ones) collapses most coarse assignments onto few supers,
    // leaving stride-seeded supers with zero members; those must not reach
    // the kernel — a probe set of only-empty supers returns an empty array
    // and element_at(..., 1) errors under ANSI
    val rnd = new scala.util.Random(7)
    val hub = Array.fill(8)(rnd.nextGaussian())
    val cents: Seq[Array[Double]] =
      Seq.fill(120)(hub.clone()) ++ Seq.fill(8)(Array.fill(8)(rnd.nextGaussian()))
    val (sup, mem) = IvfAnn.coarsen(cents, superK = 16)
    mem.foreach(_.length should be > 0)
    sup.length shouldBe mem.length
    // still a partition of the full codebook
    mem.map(_.length).sum shouldBe cents.length
    mem.flatten.toSet.size shouldBe cents.length
  }
}
