package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** W24: integer equirectangular radius search — exact equality with a
  * driver-side reference of the same long arithmetic, membership
  * agreement with true haversine outside a ±10% boundary band, bbox
  * predicates reaching the parquet scan, k-prefix, partitioning
  * independence, southern/western-hemisphere centers. */
class GeoSpec extends SparkSpec {
  import spark.implicits._

  private def randomPts(seed: Int, n: Int): Seq[(Long, Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      (i.toLong, (rnd.nextDouble() * 120e6 - 60e6).toLong,
        (rnd.nextDouble() * 360e6 - 180e6).toLong)
    }
  }

  /** The operator's exact integer metric, on the driver. */
  private def brute(pts: Seq[(Long, Long, Long)], lat0: Long, lon0: Long,
      r: Long, k: Int): Seq[(Long, Long, Long, Long)] = {
    val c = Geo.cosPm(lat0)
    pts.flatMap { case (id, la, lo) =>
      val de = math.abs(lo - lon0) * c / 1000
      val dlat = math.abs(la - lat0)
      val d2 = dlat * dlat + de * de
      if (d2 <= r * r) Some((id, la, lo, d2)) else None
    }.sortBy { case (id, _, _, d2) => (d2, id) }.take(k)
  }

  private def run(pts: Seq[(Long, Long, Long)], lat0: Long, lon0: Long,
      r: Long, k: Int): Seq[(Long, Long, Long, Long)] =
    Geo.radiusSearch(pts.toDF("id", "lat", "lon"), "id", "lat", "lon",
        lat0, lon0, r, k)
      .as[(Long, Long, Long, Long)].collect().toSeq

  test("≡ driver-side integer reference, all four hemisphere centers (W24)") {
    val pts = randomPts(1, 30000)
    for ((lat0, lon0) <- Seq((48856600L, 2352200L), (-33868800L, 151209300L),
        (37774900L, -122419400L), (-23550500L, -46633300L))) {
      run(pts, lat0, lon0, 5000000L, 200) shouldBe
        brute(pts, lat0, lon0, 5000000L, 200)
    }
  }

  test("membership agrees with true haversine outside a ±10% band (W24)") {
    val (lat0, lon0) = (48856600L, 2352200L)
    val r = 4491600L // ≈ 500 km
    val pts = randomPts(7, 50000)
    val got = run(pts, lat0, lon0, r, 50000).map(_._1).toSet
    def haversineM(laU: Long, loU: Long): Double = {
      val (la1, lo1, la2, lo2) = (math.toRadians(lat0 / 1e6),
        math.toRadians(lon0 / 1e6), math.toRadians(laU / 1e6),
        math.toRadians(loU / 1e6))
      val a = math.pow(math.sin((la2 - la1) / 2), 2) +
        math.cos(la1) * math.cos(la2) * math.pow(math.sin((lo2 - lo1) / 2), 2)
      2 * 6371000.0 * math.asin(math.sqrt(a))
    }
    val rM = r * 0.111195 // microdeg of latitude → meters at Re = 6371 km
    var checked = 0
    pts.foreach { case (id, la, lo) =>
      val h = haversineM(la, lo)
      if (h < 0.9 * rM) { got should contain(id); checked += 1 }
      else if (h > 1.1 * rM) { got should not contain id; checked += 1 }
    }
    checked should be > 49000 // the excluded band is thin
  }

  test("bbox predicates reach the parquet scan as PushedFilters (W24)") {
    val dir = graft.Scratch.fresh("geo_pushdown")
    randomPts(3, 5000).toDF("id", "lat", "lon").write.mode("overwrite").parquet(dir)
    val q = Geo.radiusSearch(spark.read.parquet(dir), "id", "lat", "lon",
      48856600L, 2352200L, 4491600L, 100)
    // the rendered plan truncates PushedFilters — read the scan's own
    // metadata, which carries the full pushed list
    val pushed = q.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metadata("PushedFilters")
    }
    pushed should have size 1
    pushed.head should include("GreaterThanOrEqual(lat")
    pushed.head should include("LessThanOrEqual(lat")
    pushed.head should include("GreaterThanOrEqual(lon")
    pushed.head should include("LessThanOrEqual(lon")
  }

  test("k truncation is a prefix; partitioning-independent (W24)") {
    val pts = randomPts(11, 20000)
    val full = run(pts, -10000000L, 100000000L, 8000000L, 100000)
    run(pts, -10000000L, 100000000L, 8000000L, 17) shouldBe full.take(17)
    Geo.radiusSearch(pts.toDF("id", "lat", "lon").repartition(13), "id",
        "lat", "lon", -10000000L, 100000000L, 8000000L, 17)
      .as[(Long, Long, Long, Long)].collect().toSeq shouldBe full.take(17)
  }

  test("bbox never clips a circle-boundary point (W24 regression)") {
    // Paris query, cos_pm = 658: dlon = 6826141 projects to
    // floor(6826141·658/1000) = 4491600 = R exactly — inside the circle,
    // but past ceil(R·1000/658) = 6826140, the old (too-tight) lon bound
    val (lat0, lon0, r) = (48856600L, 2352200L, 4491600L)
    Geo.cosPm(lat0) shouldBe 658L
    val pts = Seq((1L, lat0, lon0 + 6826141L), // dist2 = R², boundary-inside
      (2L, lat0, lon0 + 6826142L))             // projects to R+1: outside
    val ids = run(pts, lat0, lon0, r, 10).map(_._1)
    ids shouldBe Seq(1L)
  }

  test("polar center is rejected; tiny radius finds only the exact point (W24)") {
    an[IllegalArgumentException] should be thrownBy
      Geo.radiusSearch(Seq((1L, 89999000L, 0L)).toDF("id", "lat", "lon"),
        "id", "lat", "lon", 89999000L, 0L, 1000L, 5)
    val pts = Seq((1L, 10000000L, 10000000L), (2L, 10000500L, 10000000L))
    run(pts, 10000000L, 10000000L, 400L, 5) shouldBe
      Seq((1L, 10000000L, 10000000L, 0L))
  }

  test("pairsWithin equals the brute-force pair set, each pair exactly once (W25)") {
    val pts = randomPts(77, 400).toDF("id", "lat", "lon")
    val eps = 20000000L // dense radius so the pair set is non-trivial
    val got = Geo.pairsWithin(pts, "id", "lat", "lon", eps)
      .as[(Long, Long, Long)].collect().toSeq
    got.distinct.size shouldBe got.size // exactly-once emission
    val raw = randomPts(77, 400)
    val expect = (for {
      a <- raw; b <- raw if a._1 < b._1
      d2 = (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)
      if d2 <= eps * eps
    } yield (a._1, b._1, d2)).toSet
    got.toSet shouldBe expect
    expect should not be empty
  }

  test("pairsWithin plans as an equi-join on the cell key, never a nested loop (W25)") {
    val pts = randomPts(88, 200).toDF("id", "lat", "lon")
    val plan = Geo.pairsWithin(pts, "id", "lat", "lon", 1000000L)
      .queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
  }

  test("pairsWithin finds boundary pairs exactly eps apart, across cells and hemispheres (W25)") {
    val eps = 1000L
    val pts = Seq(
      (1L, 0L, 0L), (2L, eps, 0L),            // exactly eps, straddles cell edge
      (3L, -5000000L, -5000000L), (4L, -5000000L, -5000000L + eps), // negative coords
      (5L, 0L, 3 * eps))                      // out of range of everyone
      .toDF("id", "lat", "lon")
    Geo.pairsWithin(pts, "id", "lat", "lon", eps)
      .as[(Long, Long, Long)].collect().toSet shouldBe
      Set((1L, 2L, eps * eps), (3L, 4L, eps * eps))
  }
}
