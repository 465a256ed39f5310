package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zvalue interleaves bits Morton-style (R21)") {
    // (x=0b11, y=0b01), 2 bits → z = y1 x1 y0 x0 = 0b0111 = 7
    val z = Seq((3L, 1L)).toDF("x", "y")
      .select(ZOrder.zvalue(Seq(col("x"), col("y")), bits = 2).as("z"))
      .as[Long].collect().head
    z shouldBe 7L
    // single column degenerates to the identity on the low bits
    val zs = Seq(5L).toDF("x")
      .select(ZOrder.zvalue(Seq(col("x")), bits = 3).as("z")).as[Long].collect().head
    zs shouldBe 5L
  }

  /** Per-file [min,max] boxes of both dimensions for a written layout. */
  private def fileBoxes(path: String): Array[(Double, Double, Double, Double)] =
    spark.read.parquet(path)
      .groupBy(input_file_name())
      .agg(min(col("x").cast("double")), max(col("x").cast("double")),
        min(col("y").cast("double")), max(col("y").cast("double")))
      .collect()
      .map(r => (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))

  test("clustered write round-trips exactly and prunes on BOTH dimensions (R21)") {
    // uniform grid: x,y in [0, 1000); independent dimensions
    val rng = new scala.util.Random(7)
    val rows = Seq.fill(20000)((rng.nextInt(1000).toLong, rng.nextInt(1000).toLong))
    val df = rows.toDF("x", "y")

    val zDir  = java.nio.file.Files.createTempDirectory("zspec_z").toString
    val linDir = java.nio.file.Files.createTempDirectory("zspec_lin").toString
    ZOrder.writeClustered(df, Seq("x", "y"), zDir, partitions = 16)
    // baseline: classic single-dimension sort layout
    df.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(linDir)

    // 1. round trip is exact (same multiset of rows)
    val back = spark.read.parquet(zDir).as[(Long, Long)].collect().sorted
    back shouldBe rows.sorted.toArray

    // 2. pruning: a 10%x10% box query. In the x-sorted layout every file
    // spans all of y, so a y-only filter intersects every file; the z-order
    // layout bounds files in BOTH dimensions, so few files intersect.
    // band chosen inside one quarter-row of the z grid (not crossing the
    // y midpoint, which would legitimately double the touched cells)
    val (loY, hiY) = (305.0, 395.0)
    val zBoxes   = fileBoxes(zDir)
    val linBoxes = fileBoxes(linDir)
    val zHit   = zBoxes.count { case (_, _, mnY, mxY) => mxY >= loY && mnY <= hiY }
    val linHit = linBoxes.count { case (_, _, mnY, mxY) => mxY >= loY && mnY <= hiY }
    linHit shouldBe linBoxes.length // x-sort: y stats are useless, all files hit
    // z-order: each file covers ~a band of the y range; a 10% y-slice must
    // skip most files (16 files ≈ 4x4 grid → ~4 hit; allow slack to 8)
    zHit should be <= (zBoxes.length / 2)
  }

  test("quantile ranks keep pruning under skew where uniform ranks collapse (R21)") {
    // x: 95% dense in [0, 100), a few outliers at ~1e9 — uniform min/max
    // quantization maps the whole dense region to bucket 0, so the layout
    // stops separating it; quantile buckets are equal-mass and stay tight.
    val rng = new scala.util.Random(11)
    val rows = Seq.fill(20000) {
      val x = if (rng.nextInt(20) == 0) 1000000000L + rng.nextInt(1000)
              else rng.nextInt(100).toLong
      (x, rng.nextInt(1000).toLong)
    }
    val df = rows.toDF("x", "y")

    val uniDir = java.nio.file.Files.createTempDirectory("zspec_uni").toString
    val qDir   = java.nio.file.Files.createTempDirectory("zspec_q").toString
    ZOrder.writeClustered(df, Seq("x", "y"), uniDir, partitions = 16)
    ZOrder.writeClusteredQuantile(df, Seq("x", "y"), qDir, partitions = 16)

    // round trip exact
    val back = spark.read.parquet(qDir).as[(Long, Long)].collect().sorted
    back shouldBe rows.sorted.toArray

    // an x-range query inside the dense region
    val (loX, hiX) = (40.0, 60.0)
    def hits(path: String) = fileBoxes(path).count {
      case (mnX, mxX, _, _) => mxX >= loX && mnX <= hiX }
    val uniHit = hits(uniDir)
    val qHit   = hits(qDir)
    // uniform: every dense row is in x-bucket 0 → z orders by y only → all
    // (or nearly all) files span the dense x range
    uniHit should be >= (fileBoxes(uniDir).length - 1)
    // quantile: the 20%-mass slice straddles the top-bit rank boundary, so
    // it can touch 2 of the 4 x-quadrants plus range-partition edge files —
    // still a strict improvement where uniform prunes nothing
    qHit should be < uniHit
    qHit should be <= (fileBoxes(qDir).length * 3 / 4)
  }
}
