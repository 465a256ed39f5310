package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** R46: Misra–Gries sketch guarantee + exact-verify determinism — the
  * candidate set always covers the true heavy hitters, the final frame
  * equals a brute-force GROUP BY/HAVING, independent of partitioning. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  /** Zipf-ish random stream: a few heavy keys + long uniform tail. */
  private def stream(seed: Int, n: Int): Seq[Long] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { _ =>
      val r = rnd.nextDouble()
      if (r < 0.30) 1L
      else if (r < 0.42) 2L
      else if (r < 0.50) 3L
      else 1000L + rnd.nextInt(5000)
    }
  }

  private def brute(xs: Seq[Long], cap: Int): Seq[(Long, Long)] = {
    val n = xs.size.toLong
    xs.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * (cap + 1) > n }
      .toSeq.sortBy(_._1)
  }

  test("exact result ≡ brute-force GROUP BY/HAVING on random skewed streams (R46)") {
    for (seed <- Seq(1, 7, 13)) {
      val xs = stream(seed, 20000)
      val got = HeavyHitters.exact(xs.toDF("k"), "k", capacity = 20)
        .as[(Long, Long)].collect().toSeq
      got shouldBe brute(xs, 20)
    }
  }

  test("result is independent of partitioning (R46)") {
    val xs = stream(99, 30000)
    val expected = brute(xs, 10)
    for (p <- Seq(1, 7, 32)) {
      HeavyHitters.exact(xs.toDF("k").repartition(p), "k", capacity = 10)
        .as[(Long, Long)].collect().toSeq shouldBe expected
    }
  }

  test("sketch candidates cover every true heavy hitter at tight capacity (R46)") {
    // capacity 3 with three heavies at 30/12/8% — φ = 25%, only key 1
    // is guaranteed; assert the GUARANTEE (coverage), not the extras
    for (seed <- Seq(5, 21, 33); p <- Seq(1, 8)) {
      val xs = stream(seed, 10000)
      val n = xs.size.toLong
      val heavies = xs.groupBy(identity).view.mapValues(_.size.toLong)
        .filter { case (_, c) => c * 4 > n }.keySet
      val cands = xs.toDF("k").repartition(p)
        .agg(graft.functions.FrequentItems.misraGries(col("k"), 3).as("c"))
        .as[Seq[Long]].head().toSet
      cands.size should be <= 3
      heavies.foreach(h => cands should contain(h))
    }
  }

  test("uniform stream yields an empty result; nulls are ignored (R46)") {
    val xs = (0 until 10000).map(i => (i % 500).toLong)
    HeavyHitters.exact(xs.toDF("k"), "k", capacity = 20).count() shouldBe 0L
    val withNulls = xs.map(x => if (x % 3 == 0) None else Some(x)).toDF("k")
    // nulls drop from both the sketch and n: ≡ the non-null sub-stream
    val nn = xs.filter(_ % 3 != 0)
    HeavyHitters.exact(withNulls, "k", capacity = 20)
      .as[(Long, Long)].collect().toSeq shouldBe brute(nn, 20)
  }

  test("single dominant key at capacity 1 (R46)") {
    val xs = Seq.fill(900)(5L) ++ (0 until 100).map(i => 2000L + i)
    HeavyHitters.exact(xs.toDF("k").repartition(5), "k", capacity = 1)
      .as[(Long, Long)].collect().toSeq shouldBe Seq((5L, 900L))
  }
}
