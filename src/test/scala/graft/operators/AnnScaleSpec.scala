package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** S2 scale-invariance: the LSH planner must hold recall constant as the
  * corpus grows, not just measure well at one test SF. Two angles:
  *
  *   1. the planner law itself, across six decades of corpus size — the
  *     binomial-model prediction stays at the target while tables grow
  *     ~log n and the config never exceeds its caps (pure arithmetic,
  *     covers sizes no test corpus can reach);
  *   2. measured recall vs the exact S1 scan at sf0.001 AND sf0.1 (100×
  *     rows) in one run, asserting both clear the gate bound and the large
  *     SF does not decay below the small one.
  */
class AnnScaleSpec extends SparkSpec {

  test("LSH planner holds predicted recall across six decades of n (S2)") {
    val plans = Seq(1e3, 1e4, 1e5, 1e6, 1e7, 1e8, 1e9).map { n =>
      val plan = Similarity.lshPlan(n.toLong, dim = 64, k = 10)
      withClue(s"n=$n plan=$plan: ") {
        // predicted recall is the invariant — no decay with corpus size
        plan.predictedRecall should be >= 0.93
        plan.tables should be <= 48
        plan.radius should be <= 3
        // per-query probe volume stays sub-linear: probed buckets × mean
        // occupancy must stay far below a brute-force corpus scan
        val probedCandidates =
          plan.tables.toDouble * Similarity.masksCount(plan.bits, plan.radius) *
            (n / math.pow(2.0, plan.bits))
        if (n >= 1e6) probedCandidates should be < 0.25 * n
      }
      plan
    }
    // the scale response is MORE tables (corpus re-hashes, the log-n law),
    // never fewer — a planner that relaxed tables at large n would be
    // recovering the fixed-config decay this spec exists to prevent
    plans.sliding(2).foreach { case Seq(a, b) =>
      b.tables should be >= a.tables
    }
  }

  test("planner sheds bits when caps cannot reach the target (the n^rho fallback)") {
    // a brutally far design point (cos 0.15 -> p ~ 0.45): even radius 3 at
    // max tables cannot reach 0.95 at occupancy bits for a huge corpus, so
    // the planner must trade bucket size for recall instead of silently
    // returning a config it predicts will miss
    val plan = Similarity.lshPlan(1_000_000_000L, dim = 64, k = 10, designSim = 0.15)
    val occupancyBits = Similarity.autoBits(1_000_000_000L, targetBucket = 64, minBits = 4)
    withClue(s"plan=$plan occupancyBits=$occupancyBits: ") {
      plan.bits should be < occupancyBits
      // either the shed recovered the target, or it bottomed out at
      // minBits with the config maxed — never a quiet middle ground
      if (plan.predictedRecall < 0.95) {
        plan.bits shouldBe 4
        plan.tables shouldBe 48
        plan.radius shouldBe 3
      }
    }
    // pinned tables disable shedding: the caller owns that trade
    val pinned = Similarity.lshPlan(1_000_000_000L, dim = 64, k = 10,
      designSim = 0.15, fixedTables = 4)
    pinned.bits shouldBe occupancyBits
  }

  test("measured LSH recall >= 0.9 at sf0.001 and sf0.1 and does not decay across 100x (S2)") {
    val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.1")
    assume(dirs.forall(d => new java.io.File(d).exists()), "testdata not present")
    val recalls = dirs.map { dir =>
      val base = graft.Tables(spark, dir).embeddings
      val n = base.count()
      val queries = base.filter(col("vec_id") < 32)
      val exact = Similarity.bruteForceTopK(queries, base, "vec_id", "embedding", k = 10)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val approx = Similarity.lshTopK(queries, base, "vec_id", "embedding", k = 10, knownN = n)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (exact intersect approx).size.toDouble / exact.size
      info(f"$dir n=$n recall=$recall%.4f")
      recall
    }
    recalls.foreach(_ should be >= 0.9)
    // non-decay across 100× rows (small tolerance for sampling noise in
    // which statistical-tail neighbors the 32 queries happen to have)
    recalls(1) should be >= recalls(0) - 0.05
  }
}
