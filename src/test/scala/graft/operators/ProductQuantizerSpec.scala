package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProductQuantizerSpec extends SparkSpec {
  import spark.implicits._

  private def randomVecs(n: Int, dim: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, Array.fill(dim)(rnd.nextGaussian())))
      .toDF("id", "v")
  }

  test("codes are in range, deterministic, and identical vectors code identically (S5)") {
    val vecs = randomVecs(200, 16, seed = 7)
    val cb = ProductQuantizer.train(vecs, "v", m = 4, k = 8, iters = 3)
    cb.books.length shouldBe 4
    cb.books.foreach(_.length shouldBe 8)
    val coded = ProductQuantizer.encode(vecs, "v", cb)
      .select(col("id"), col("pq_codes"))
    val rows = coded.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    rows.size shouldBe 200
    rows.values.foreach { cs =>
      cs.length shouldBe 4
      cs.foreach { c => c should be >= 0; c should be < 8 }
    }
    // re-encoding is bit-identical (pure function of vector + codebook)
    ProductQuantizer.encode(vecs, "v", cb)
      .select(col("id"), col("pq_codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap shouldBe rows
    // a duplicated vector codes identically to its original
    val dup = vecs.withColumn("id", col("id") + 1000)
    val dupCodes = ProductQuantizer.encode(dup, "v", cb)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](2)).toMap
    rows.foreach { case (id, cs) => dupCodes(id + 1000) shouldBe cs }
  }

  test("k=8 codebooks reconstruct strictly better than k=1 subspace means (S5)") {
    val vecs = randomVecs(300, 16, seed = 11)
    val rich = ProductQuantizer.train(vecs, "v", m = 4, k = 8, iters = 4)
    val flat = ProductQuantizer.train(vecs, "v", m = 4, k = 1, iters = 2)
    def meanErr(cb: ProductQuantizer.Codebooks) =
      ProductQuantizer.encode(vecs, "v", cb)
        .select(avg(ProductQuantizer.reconstructionError("v", "pq_codes", cb)).as("e"))
        .head().getDouble(0)
    val e8 = meanErr(rich)
    val e1 = meanErr(flat)
    e8 should be < e1 * 0.9
  }

  test("train rejects a dimension not divisible by m (S5)") {
    an[IllegalArgumentException] should be thrownBy
      ProductQuantizer.train(randomVecs(50, 10, 3), "v", m = 4, k = 4)
  }
}
