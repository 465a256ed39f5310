package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus: DataFrame = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy dog near the river bank"),       // near dup of 1
    (4L, "completely different content about spark distributed query engines and shuffles"),
    (5L, "another unrelated document mentioning databases indexes and storage formats")
  ).toDF("id", "text")

  test("exactDedup keeps min-id winner per content group (D1)") {
    val kept = Dedup.exactDedup(corpus, "text", "id").select("id").as[Long].collect().toSet
    kept shouldBe Set(1L, 3L, 4L, 5L)
    val stats = Dedup.dupStats(corpus, "text", "id")
      .filter(col("n_copies") > 1).collect()
    stats.length shouldBe 1
    stats.head.getLong(1) shouldBe 1L // keep_id
    stats.head.getLong(2) shouldBe 2L // n_copies
  }

  test("minhash LSH finds exact and near dups, not unrelated docs (D2)") {
    val pairs = Dedup.minhashLsh(corpus, "text", "id", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    pairs should contain((1L, 2L))
    pairs should contain((1L, 3L))
    pairs should not contain ((4L, 5L))
  }

  test("estimated jaccard ≈ exact jaccard on candidates (D2/D4)") {
    val candidates = Dedup.minhashLsh(corpus, "text", "id", threshold = 0.3)
    val verified = Dedup.jaccardVerify(candidates.select("id_a", "id_b"), corpus, "text", "id")
      .select(col("id_a"), col("id_b"), col("jaccard")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    verified((1L, 2L)) shouldBe 1.0 // identical
    verified((1L, 3L)) should be > 0.6
    val est = candidates.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    math.abs(est((1L, 2L)) - 1.0) should be < 0.01
    math.abs(est((1L, 3L)) - verified((1L, 3L))) should be < 0.25 // 64 hashes → ±1.96/√64 ≈ 0.25
  }

  test("ngramJaccardDedup finds exactly the J>=t pairs via prefix filtering (D4)") {
    val pairs = Dedup.ngramJaccardDedup(corpus, "text", "id", threshold = 0.5)
      .select("id_a", "id_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    pairs.keySet shouldBe Set((1L, 2L), (1L, 3L), (2L, 3L))
    pairs((1L, 2L)) shouldBe 1.0
    pairs((1L, 3L)) should be > 0.6
    // blocking-independence: the result equals brute-force exact Jaccard,
    // and the plain inverted-index baseline returns the identical set
    val ids   = corpus.select("id").as[Long].collect()
    val brute = Dedup.jaccardVerify(
      ids.combinations(2).map(p => (p.min, p.max)).toSeq.toDF("id_a", "id_b"),
      corpus, "text", "id").filter(col("jaccard") >= 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    pairs.keySet shouldBe brute
    val viaBasic = Dedup.ngramJaccardDedupBasic(corpus, "text", "id", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    viaBasic shouldBe brute
  }

  test("simhash: identical text → distance 0, near text → small, unrelated → large (D3)") {
    val sigs = corpus.select(col("id"), Dedup.simhash(col("text")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    ham(sigs(1L), sigs(2L)) shouldBe 0
    ham(sigs(1L), sigs(3L)) should be <= 8
    ham(sigs(1L), sigs(4L)) should be > 10
  }

  test("simhashPairs blocking finds pairs within maxHamming (D3)") {
    val pairs = Dedup.simhashPairs(corpus, "text", "id", maxHamming = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    pairs should contain((1L, 2L))
    pairs should contain((1L, 3L))
    pairs should not contain ((4L, 5L))
  }

  test("decontaminate flags exactly the train docs sharing a shingle with eval (D7)") {
    val train = Seq(
      (10L, "the quick brown fox jumps high"),    // shares "the quick brown" w/ eval
      (11L, "completely unrelated training text body"),
      (12L, "benchmark answer leaked verbatim here now")) // shares a full eval doc
      .toDF("id", "text")
    val eval = Seq(
      (1L, "the quick brown dog"),
      (2L, "benchmark answer leaked verbatim here now"))
      .toDF("id", "text")
    val hits = Dedup.decontaminate(train, eval, "text", "id", shingleK = 3)
      .as[Long].collect().toSet
    hits shouldBe Set(10L, 12L)
  }

  test("decontaminateBloom never misses an exact hit; clean corpus stays clean (D8)") {
    val train = Seq(
      (10L, "the quick brown fox jumps high"),
      (11L, "completely unrelated training text body"),
      (12L, "benchmark answer leaked verbatim here now"),
      (13L, "another clean doc with private words only"),
      (14L, "yet more disjoint vocabulary nothing shared"))
      .toDF("id", "text")
    val eval = Seq(
      (1L, "the quick brown dog"),
      (2L, "benchmark answer leaked verbatim here now"))
      .toDF("id", "text")
    val exact = Dedup.decontaminate(train, eval, "text", "id", shingleK = 3)
      .as[Long].collect().toSet
    val bloom = Dedup.decontaminateBloom(train, eval, "text", "id", shingleK = 3,
      expectedItems = 1024, fpp = 0.001)
      .as[Long].collect().toSet
    // no false negatives, ever: bloom ⊇ exact
    (exact -- bloom) shouldBe empty
    // at fpp=0.1% over a handful of shingles, false positives are
    // overwhelmingly unlikely — the clean docs stay clean
    bloom shouldBe exact
  }

  test("decontaminateNear flags exact-Jaccard near-dups of eval docs, nothing else (D9)") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),   // near-dup of eval 101
      (2L, "totally different words nothing shared here at all"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // J vs eval 101 high
      (4L, "one shared alpha token only in this document body"))
      .toDF("id", "text")
    val eval = Seq(
      (101L, "alpha beta gamma delta epsilon zeta eta theta tail"),
      (102L, "unrelated eval question about something private"))
      .toDF("id", "text")
    val flagged = Dedup.decontaminateNear(train, eval, "text", "id",
      shingleK = 3, threshold = 0.5).as[Long].collect().toSet
    // doc 1: sets differ by one appended shingle → J = 6/7 ≥ 0.5
    // doc 3: two extra tokens + tail divergence → J = 6/9... compute: A
    // (10 toks → 8 shingles), eval 101 (9 toks → 7 shingles), overlap 6
    // → 6/9 ≥ 0.5 — flagged
    // docs 2/4: near-zero overlap; eval ids themselves never emitted
    flagged shouldBe Set(1L, 3L)
  }

  test("decontaminateNear rejects overlapping train/eval ids in-plan (D9)") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "totally different words nothing shared here at all"))
      .toDF("id", "text")
    // id 1 appears in BOTH sets — a violated contract that would silently
    // merge the two docs' shingle sets and corrupt the pair graph
    val eval = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta tail"))
      .toDF("id", "text")
    val ex = intercept[Exception] {
      Dedup.decontaminateNear(train, eval, "text", "id",
        shingleK = 3, threshold = 0.5).collect()
    }
    ex.getMessage should include("disjoint")
  }

  test("keepBestPerCluster elects argmax(score) per component, min-id ties, singletons self (D13)") {
    val docs = Seq(
      (1L, 10), (2L, 50), (3L, 50),  // cluster {1,2,3}: best score 50, tie → min id 2
      (4L, 7),                       // singleton keeps itself
      (5L, 1), (6L, 9))              // cluster {5,6}: 6 wins on score
      .toDF("id", "score")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val out = Dedup.keepBestPerCluster(docs, "id", pairs, col("score"))
      .select("id", "component", "kept_id", "is_kept")
      .as[(Long, Long, Long, Boolean)].collect().toSet
    out shouldBe Set(
      (1L, 1L, 2L, false), (2L, 1L, 2L, true), (3L, 1L, 2L, false),
      (4L, 4L, 4L, true),
      (5L, 5L, 6L, false), (6L, 5L, 6L, true))
  }

  test("setJaccardPairs on arbitrary id sets equals brute force, boundary inclusive (W26)") {
    val sets = Seq(
      (1L, Seq(10L, 20L, 30L, 40L)),
      (2L, Seq(10L, 20L, 30L, 50L)),   // J(1,2) = 3/5 = 0.6
      (3L, Seq(10L, 20L)),             // J(1,3) = 2/4 = 0.5 — exact boundary
      (4L, Seq(70L, 80L, 90L)),        // disjoint from all
      (5L, Seq(10L, 20L, 30L, 40L)))   // J(1,5) = 1.0
      .toDF("id", "__set")
    val got = Dedup.setJaccardPairs(sets, threshold = 0.5)
      .select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val raw = Seq(1L -> Set(10L, 20L, 30L, 40L), 2L -> Set(10L, 20L, 30L, 50L),
      3L -> Set(10L, 20L), 4L -> Set(70L, 80L, 90L), 5L -> Set(10L, 20L, 30L, 40L))
    val expect = (for {
      (a, sa) <- raw; (b, sb) <- raw if a < b
      j = sa.intersect(sb).size.toDouble / sa.union(sb).size
      if j >= 0.5
    } yield (a, b, j)).toSet
    got shouldBe expect
    got.exists { case (a, b, j) => Set(a, b) == Set(1L, 3L) && j == 0.5 } shouldBe true
  }

  test("softDedupWeights gives each copy 1000 div groupsize per-mille (D14)") {
    val out = Dedup.softDedupWeights(corpus, "text", "id")
      .select("id", "n_copies", "weight_pm")
      .as[(Long, Long, Long)].collect().toSet
    // docs 1 and 2 are exact duplicates (group of 2); the rest are unique
    out shouldBe Set(
      (1L, 2L, 500L), (2L, 2L, 500L),
      (3L, 1L, 1000L), (4L, 1L, 1000L), (5L, 1L, 1000L))
  }

  test("keepBestPerCluster with a constant score degenerates to d6's min-id canonical (D13)") {
    val pairs = Dedup.ngramJaccardDedup(corpus, "text", "id", threshold = 0.5)
      .select("id_a", "id_b")
    val best = Dedup.keepBestPerCluster(corpus, "id", pairs, lit(0))
      .select("id", "kept_id").as[(Long, Long)].collect().toMap
    val minId = ConnectedComponents.labels(corpus.select("id"), pairs)
      .select("id", "component").as[(Long, Long)].collect().toMap
    best shouldBe minId
  }
}
