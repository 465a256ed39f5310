package graft.operators

import graft.SparkSpec
import graft.functions.{PqExpressions, PqKernel}
import org.apache.spark.sql.functions._

/** S6: IVF-PQ — ADC-table exactness, exact-mode degradation to brute force,
  * planted-copy structure, shortlist hygiene on the exchange, and the
  * compression accounting that motivates the operator. */
class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16

  // 3 separated clusters in 16-d + isotropic noise rows
  private lazy val vecs = {
    val rng = new scala.util.Random(23)
    val centers = Seq.fill(3)(Array.fill(dim)(rng.nextGaussian() * 3))
    (0 until 150).map { i =>
      val c = centers(i % 3)
      (i.toLong, c.map(x => x + 0.3 * rng.nextGaussian()))
    }.toDF("vec_id", "embedding")
  }

  private lazy val index = IvfPq.build(vecs, "embedding", cells = 4, m = 4, k = 8, iters = 4)

  test("ADC score via table lookups == distance to the decoded vector (S6 ADC exactness)") {
    val enc: Map[Long, (Int, Array[Int])] = IvfPq.encode(vecs, "vec_id", "embedding", index)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getSeq[Int](2).toArray))).toMap
    val raw = vecs.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val books = index.cb.books.map(_.map(_.clone()).toArray).toArray
    val q = raw(0L)
    for (id <- raw.keys.take(40)) {
      val (cid, codes) = enc(id)
      val rq = PqKernel.residual(q, index.centroids(cid).toArray)
      val table = PqKernel.adcTable(rq, books)
      val viaTable = codes.indices.map(j => table(j * index.cb.k + codes(j))).sum
      // brute force against the decoded reconstruction of the candidate
      val decoded = codes.indices.flatMap(j => books(j)(codes(j))).toArray
      val brute = rq.zip(decoded).map { case (a, b) => (a - b) * (a - b) }.sum
      math.abs(viaTable - brute) should be <= 1e-9 * math.max(1.0, brute)
    }
  }

  test("full probe + full shortlist degrades to exact brute-force top-k (S6 exactness envelope)") {
    val queries = vecs.filter(col("vec_id") < 8)
    val enc = IvfPq.encode(vecs, "vec_id", "embedding", index)
    val exact = Similarity.bruteForceTopK(queries, vecs, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // probing every cell with a corpus-sized shortlist leaves re-rank as a
    // full exact scan — quantization must not change the answer
    val full = IvfPq.search(queries, enc, vecs, "vec_id", "embedding", index,
        k = 5, nprobe = index.centroids.length, shortlist = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    full shouldBe exact
  }

  test("exact copies share cell and codes; copy wins top-1 at cosine 1 (S6 structural)") {
    val copies = vecs.withColumn("vec_id", col("vec_id") + 1000000)
    val planted = vecs.unionByName(copies)
    val enc = IvfPq.encode(planted, "vec_id", "embedding", index)
    val byId = enc.collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getSeq[Int](2)))).toMap
    for (id <- 0L until 150L) {
      byId(id) shouldBe byId(id + 1000000)
    }
    val res = IvfPq.search(planted.filter(col("vec_id") < 16), enc, planted,
        "vec_id", "embedding", index, k = 1, nprobe = 2, shortlist = 32)
      .collect()
    res.length shouldBe 16
    res.foreach { r =>
      r.getLong(1) shouldBe r.getLong(0) + 1000000
      r.getDouble(2) shouldBe 1.0 +- 1e-9
    }
  }

  test("clustered-corpus recall >= 0.9 at nprobe 2 (S6 search quality)") {
    val queries = vecs.filter(col("vec_id") < 16)
    val enc = IvfPq.encode(vecs, "vec_id", "embedding", index)
    val exact = Similarity.bruteForceTopK(queries, vecs, "vec_id", "embedding", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = IvfPq.search(queries, enc, vecs, "vec_id", "embedding", index,
        k = 10, nprobe = 2, shortlist = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    recall should be >= 0.9
  }

  test("no vectors or ADC tables cross the shortlist exchange; no Window (S6 plan hygiene)") {
    val enc = IvfPq.encode(vecs, "vec_id", "embedding", index)
    val plan = IvfPq.search(vecs.filter(col("vec_id") < 4), enc, vecs,
        "vec_id", "embedding", index, k = 3, nprobe = 2, shortlist = 16)
      .queryExecution.executedPlan.toString
    plan should not include "Window"
    // the TopK shortlist exchange ships (query_id, neighbor_id, __adc) only —
    // the per-(query,cell) table column is projected away before the heap
    val exchanges = plan.split("\n").filter(_.contains("Exchange"))
    exchanges.foreach { line =>
      line should not include "__tab"
      line should not include "__qv"
      line should not include "__cv"
    }
  }

  test("the encoded store is the compressed store: m ints + cid per row (S6 accounting)") {
    val enc = IvfPq.encode(vecs, "vec_id", "embedding", index)
    enc.columns.toSeq shouldBe Seq("vec_id", "cid", "pq_codes")
    val r = enc.head()
    r.getSeq[Int](2).length shouldBe index.cb.m
    // every code addresses a real codeword
    enc.select(explode(col("pq_codes")).as("c"))
      .agg(min("c"), max("c")).head() match {
      case row =>
        row.getInt(0) should be >= 0
        row.getInt(1) should be < index.cb.k
    }
  }

  test("interpreted and codegen paths agree (S6 kernel parity)") {
    // force the interpreted path via eval on the expression, compare with a
    // dataframe (codegen) evaluation of the same pqEncode/adcScore algebra
    val enc = IvfPq.encode(vecs, "vec_id", "embedding", index)
    val viaDf = enc.orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2).toSeq))
    val books = index.cb.books.map(_.map(_.clone()).toArray).toArray
    val cents = index.centroids.map(_.clone()).toArray
    val raw = vecs.orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    raw.zip(viaDf).foreach { case ((id, v), (id2, cid, codes)) =>
      id shouldBe id2
      val expected = PqKernel.encode(PqKernel.residual(v, cents(cid)), books).toSeq
      codes shouldBe expected
    }
  }
}
