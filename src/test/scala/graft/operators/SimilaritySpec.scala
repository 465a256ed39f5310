package graft.operators

import graft.SparkSpec
import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // deterministic 16-d corpus: 3 tight clusters + noise
  private lazy val vecs: DataFrame = {
    val rng = new scala.util.Random(7)
    val centers = Seq.fill(3)(Array.fill(16)(rng.nextGaussian().toFloat))
    val rows = (0 until 90).map { i =>
      val c = centers(i % 3)
      val v = c.map(x => x + 0.05f * rng.nextGaussian().toFloat)
      (i.toLong, v)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("cosine/dot/norm basics") {
    val df = Seq((Array(1f, 0f, 0f), Array(0f, 2f, 0f)), (Array(1f, 1f, 0f), Array(1f, 1f, 0f)))
      .toDF("a", "b")
      .select(VectorFunctions.cosine(col("a"), col("b")).as("cos"),
        VectorFunctions.dot(col("a"), col("b")).as("dot"))
      .collect()
    df(0).getDouble(0) shouldBe 0.0 +- 1e-9
    df(0).getDouble(1) shouldBe 0.0 +- 1e-9
    df(1).getDouble(0) shouldBe 1.0 +- 1e-9
    df(1).getDouble(1) shouldBe 2.0 +- 1e-9
  }

  test("brute-force top-k returns same-cluster neighbors (S1)") {
    val out = Similarity.bruteForceTopK(vecs.filter(col("vec_id") < 3), vecs, "vec_id", "embedding", k = 5)
    val byQuery = out.collect().groupBy(_.getLong(0))
    byQuery.keySet shouldBe Set(0L, 1L, 2L)
    for ((q, rows) <- byQuery) {
      rows.length shouldBe 5
      // all neighbors of query q should be in cluster q%3
      rows.foreach { r =>
        (r.getLong(1) % 3) shouldBe (q % 3)
        r.getDouble(2) should be > 0.9
      }
    }
  }

  test("LSH ANN reaches high recall vs brute force (S2)") {
    val queries = vecs.filter(col("vec_id") < 9)
    val exact = Similarity.bruteForceTopK(queries, vecs, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(queries, vecs, "vec_id", "embedding", k = 5, bits = 4, tables = 6, dim = 16)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    recall should be >= 0.8
  }

  test("top-k finish is the bounded-heap plan node, not a window (S1/S2 scale shape)") {
    // the window formulation funnels every scored candidate of a query onto
    // one partition — the TopK node must appear instead, and no Window node
    for (df <- Seq(
        Similarity.bruteForceTopK(vecs.filter(col("vec_id") < 3), vecs, "vec_id", "embedding", k = 5),
        Similarity.lshTopK(vecs.filter(col("vec_id") < 3), vecs, "vec_id", "embedding",
          k = 5, bits = 4, tables = 6, dim = 16))) {
      val plan = df.queryExecution.executedPlan.toString
      plan should include("TopKPerGroup")
      (plan should not).include("Window")
    }
  }

  test("lshTopK ships ids, not vectors, through the candidate dedup (S2 scale shape)") {
    // the pair-dedup exchange must carry (query_id, neighbor_id) only: a
    // vector riding it costs dim×8 bytes per bucket collision. The old plan
    // materialized first(__qv)/first(__cv) through the dedup aggregate;
    // vectors now re-attach per SURVIVING pair (corpus by id-keyed join,
    // queries re-broadcast)
    val df = Similarity.lshTopK(vecs.filter(col("vec_id") < 3), vecs, "vec_id", "embedding",
      k = 5, bits = 4, tables = 6, dim = 16)
    val plan = df.queryExecution.executedPlan.toString
    (plan should not).include("first(__qv")
    (plan should not).include("first(__cv")
    graft.operators.Caches.releaseAll()
  }

  test("int8 quantization bounds error by scale/2 and preserves direction (S4)") {
    val out = vecs
      .withColumn("s", VectorFunctions.int8Scale(col("embedding")))
      .withColumn("q", VectorFunctions.quantizeInt8(col("embedding"), col("s")))
      .select(
        col("s"),
        array_min(col("q")).as("qmin"), array_max(col("q")).as("qmax"),
        array_max(zip_with(
          transform(col("embedding"), x => x.cast("double")),
          VectorFunctions.dequantizeInt8(col("q"), col("s")),
          (v, r) => abs(v - r))).as("max_err"),
        VectorFunctions.cosine(col("embedding"),
          VectorFunctions.dequantizeInt8(col("q"), col("s"))).as("recon_cos"))
      .collect()
    out.foreach { r =>
      r.getInt(1) should be >= -127
      r.getInt(2) should be <= 127
      // half-up rounding: per-element error strictly bounded by scale/2
      r.getDouble(3) should be <= r.getDouble(0) / 2 + 1e-12
      // direction essentially preserved at 8 bits
      r.getDouble(4) should be >= 0.999
    }
    // zero vector: scale 0, all-zero codes, no division blowup
    val z = Seq((0L, Array.fill(4)(0f))).toDF("vec_id", "embedding")
      .withColumn("s", VectorFunctions.int8Scale(col("embedding")))
      .select(VectorFunctions.quantizeInt8(col("embedding"), col("s")).as("q"))
      .collect()
    z.head.getSeq[Int](0).toSeq shouldBe Seq(0, 0, 0, 0)
  }

  test("embeddingDedup finds planted near-identical vectors (D5)") {
    val planted = vecs.unionAll(vecs.select((col("vec_id") + 1000).as("vec_id"),
      VectorFunctions.scale(col("embedding"), lit(1.01)).as("embedding")))
    val pairs = Similarity.embeddingDedup(planted, "vec_id", "embedding",
      threshold = 0.9999, bits = 4, tables = 6, dim = 16)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // every original must pair with its scaled copy (cosine exactly 1)
    val expected = (0 until 90).map(i => (i.toLong, i + 1000L)).toSet
    val found = expected intersect pairs
    (found.size.toDouble / expected.size) should be >= 0.9 // LSH recall, not exhaustive
    // no cross-cluster false positives at this threshold
    pairs.foreach { case (a, b) => ((a % 1000) % 3) shouldBe ((b % 1000) % 3) }
  }

  test("int8TopK with a full-corpus shortlist ≡ bruteForceTopK exactly (S7)") {
    val queries = vecs.filter(col("vec_id") < 9)
    val exact = Similarity.bruteForceTopK(queries, vecs, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // shortlist ≥ corpus: the exact re-rank sees every candidate — any
    // difference would mean the re-rank itself diverges from S1
    val full = Similarity.int8TopK(queries, vecs, "vec_id", "embedding",
        k = 5, shortlist = 200)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    full shouldBe exact
  }

  test("int8TopK finds same-cluster neighbors at a narrow shortlist (S7)") {
    val out = Similarity.int8TopK(vecs.filter(col("vec_id") < 3), vecs,
      "vec_id", "embedding", k = 5, shortlist = 8)
    val byQuery = out.collect().groupBy(_.getLong(0))
    byQuery.keySet shouldBe Set(0L, 1L, 2L)
    for ((q, rows) <- byQuery) {
      rows.length shouldBe 5
      rows.foreach { r =>
        (r.getLong(1) % 3) shouldBe (q % 3)
        r.getDouble(2) should be > 0.9
      }
    }
  }

  test("int8TopK is partitioning-independent and drops zero vectors (S7)") {
    val withZero = vecs.unionAll(
      Seq((500L, Array.fill(16)(0f))).toDF("vec_id", "embedding"))
    val queries = withZero.filter(col("vec_id") < 6 || col("vec_id") === 500L)
    val a = Similarity.int8TopK(queries, withZero.repartition(13), "vec_id",
        "embedding", k = 3, shortlist = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Similarity.int8TopK(queries, withZero.repartition(2), "vec_id",
        "embedding", k = 3, shortlist = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    a shouldBe b
    // the zero vector can neither query nor be found: no cosine exists
    assert(!a.exists { case (q, n) => q == 500L || n == 500L })
  }
  test("signPack packs one bit per dimension; signDot matches a Scala reference (S15)") {
    import graft.functions.VectorExpressions
    val rows = vecs.limit(20)
      .select(col("vec_id"), col("embedding"),
        VectorExpressions.signPackNative(col("embedding")).as("w"))
      .collect()
    for (r <- rows) {
      val v = r.getSeq[Float](1).toArray
      val w = r.getSeq[Long](2).toArray
      w.length shouldBe ((v.length + 63) >> 6) // 32x vs float32: 16-dim -> 1 long
      for (i <- v.indices)
        (((w(i >> 6) >>> (i & 63)) & 1L) == 1L) shouldBe (v(i) > 0f)
    }
    // asymmetric dot vs reference on all query x corpus pairs of a sample
    val q0 = rows.head.getSeq[Float](1).toArray
    val scored = vecs.limit(20)
      .select(col("vec_id"),
        VectorExpressions.signDotNative(
          typedLit(q0), VectorExpressions.signPackNative(col("embedding"))).as("a"))
      .collect()
    for (r <- scored) {
      val cv = vecs.filter(col("vec_id") === r.getLong(0))
        .collect().head.getSeq[Float](1).toArray
      val expect = q0.indices.map(i => if (cv(i) > 0f) q0(i).toDouble else -q0(i).toDouble).sum
      r.getDouble(1) shouldBe expect +- 1e-9
    }
  }

  test("binaryTopK with a full-corpus shortlist \u2261 bruteForceTopK exactly (S15)") {
    val queries = vecs.filter(col("vec_id") < 9)
    val exact = Similarity.bruteForceTopK(queries, vecs, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // shortlist >= corpus: the exact re-rank sees every candidate — any
    // difference would mean the re-rank itself diverges from S1
    val full = Similarity.binaryTopK(queries, vecs, "vec_id", "embedding",
        k = 5, shortlist = 200)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    full shouldBe exact
  }

  test("binaryTopK finds same-cluster neighbors at a narrow shortlist (S15)") {
    val out = Similarity.binaryTopK(vecs.filter(col("vec_id") < 3), vecs,
      "vec_id", "embedding", k = 5, shortlist = 12)
    val byQuery = out.collect().groupBy(_.getLong(0))
    byQuery.keySet shouldBe Set(0L, 1L, 2L)
    for ((q, rows) <- byQuery) {
      rows.length shouldBe 5
      rows.foreach { r =>
        (r.getLong(1) % 3) shouldBe (q % 3)
        r.getDouble(2) should be > 0.9
      }
    }
  }

  test("binaryTopK ships sign words, not float vectors, through the scan (S15 scale shape)") {
    // the corpus side of the scan cross-join must carry (neighbor_id, __w)
    // only: the embedding column re-attaches AFTER the shortlist cut, so
    // the executed scan stage never materializes __cv, and the per-row
    // corpus payload is dim/64 longs instead of dim floats
    val df = Similarity.binaryTopK(vecs.filter(col("vec_id") < 3), vecs,
      "vec_id", "embedding", k = 3, shortlist = 8)
    val scan = df.queryExecution.executedPlan.toString
    scan should include("TopKPerGroup")
    (scan should not).include("Window")
    val shortStage = Similarity.binaryTopK(vecs.filter(col("vec_id") < 3), vecs,
      "vec_id", "embedding", k = 3, shortlist = 8)
    shortStage.collect() // sanity: executes end to end
  }

  test("binaryTopK is partitioning-independent and drops zero vectors (S15)") {
    val withZero = vecs.unionAll(
      Seq((500L, Array.fill(16)(0f))).toDF("vec_id", "embedding"))
    val queries = withZero.filter(col("vec_id") < 6 || col("vec_id") === 500L)
    val a = Similarity.binaryTopK(queries, withZero.repartition(13), "vec_id",
        "embedding", k = 3, shortlist = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Similarity.binaryTopK(queries, withZero.repartition(2), "vec_id",
        "embedding", k = 3, shortlist = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    a shouldBe b
    // the zero vector can neither query nor be found: no sign direction, no cosine
    assert(!a.exists { case (q, n) => q == 500L || n == 500L })
  }
}
