package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** T20: integer-unit BM25 ranked search — exact equality with a driver-side
  * reference of the same floor-division arithmetic, idf quantization bound
  * vs true log2, absent-term no-op, top-k prefix property, rank
  * monotonicity, partitioning independence. */
class SearchSpec extends SparkSpec {
  import spark.implicits._

  private val Terms = Seq("rare", "mid", "common", "ghost")

  /** Reference scorer with the operator's exact arithmetic. */
  private def brute(docs: Seq[(Long, String)], terms: Seq[String], k: Int)
      : Seq[(Long, Long, Long)] = {
    val toks = docs.map { case (id, t) => id -> t.trim.toLowerCase.split("\\s+").toSeq }
    val dl = toks.map { case (id, ts) => id -> ts.size.toLong }.toMap
    val n = docs.size.toLong
    val sdl = dl.values.sum
    val tf = toks.flatMap { case (id, ts) => ts.filter(terms.contains).map(w => (id, w)) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val df = tf.keys.toSeq.map(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    def idfMb(dfv: Long): Long = {
      val q = (2 * n + 2) * (2 * n + 2) * 1024L / ((2 * dfv + 1) * (2 * dfv + 1))
      val e = 63 - java.lang.Long.numberOfLeadingZeros(q)
      (e - 10) * 1000L + (q - (1L << e)) * 1000L / (1L << e)
    }
    def satU(tfv: Long, dlv: Long): Long = {
      val lennormPm = 1000L - Search.BPM + Search.BPM * dlv * n / sdl
      val denomPm = tfv * 1000L + Search.K1PM * lennormPm / 1000L
      tfv * (1000L + Search.K1PM) * 1000000L / denomPm
    }
    tf.groupBy(_._1._1).map { case (id, hits) =>
      (id, hits.size.toLong,
        hits.map { case ((_, w), tfv) => idfMb(df(w)) * satU(tfv, dl(id)) }.sum)
    }.toSeq.sortBy { case (id, _, s) => (-s, id) }.take(k)
  }

  /** Deterministic mixed corpus: Zipf-ish vocab, planted rare terms,
    * varying lengths, one empty doc. */
  private def corpus(nDocs: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("the", "a", "of", "data", "table", "row", "scan",
      "common", "mid", "join", "sort", "key", "hash", "batch")
    (0 until nDocs).map { i =>
      val len = 3 + rnd.nextInt(40)
      val words = Seq.fill(len)(vocab(rnd.nextInt(vocab.size))) ++
        (if (i % 17 == 0) Seq("rare") else Nil) ++
        (if (i % 17 == 0 && rnd.nextBoolean()) Seq("rare") else Nil)
      i.toLong -> (if (i == 7) "" else words.mkString(" "))
    }
  }

  private def run(docs: Seq[(Long, String)], terms: Seq[String], k: Int)
      : Seq[(Long, Long, Long)] =
    Search.bm25TopK(docs.toDF("doc_id", "text"), "text", "doc_id", terms, k)
      .as[(Long, Long, Long)].collect().toSeq

  test("top-k exactly equals the integer reference on a mixed corpus (T20)") {
    val docs = corpus(300)
    run(docs, Terms, 40) shouldBe brute(docs, Terms, 40)
  }

  test("interpolated-log2 idf is within 0.09 bits of true log2 and monotone (T20)") {
    val cases = (1L to 400L).map(df => (400L, df))
    val frame = cases.toDF("n", "df")
    val q = expr("((2*n + 2) * (2*n + 2) * 1024) div ((2*df + 1) * (2*df + 1))")
    val got = frame.select(col("df"), Search.log2MillibitsQ10(q).as("mb"))
      .as[(Long, Long)].collect().sortBy(_._1)
    for (((df, mb), i) <- got.zipWithIndex) {
      val trueBits = 2.0 * (math.log((2.0 * 400 + 2) / (2.0 * df + 1)) / math.log(2.0))
      (mb / 1000.0) should be <= trueBits
      (mb / 1000.0) should be >= trueBits - 0.09
      if (i > 0) mb should be <= got(i - 1)._2 // idf never grows with df
    }
  }

  test("a query term absent from the corpus contributes nothing (T20)") {
    val docs = corpus(120)
    run(docs, Terms, 30) shouldBe run(docs, Terms.filterNot(_ == "ghost"), 30)
  }

  test("k truncation is a prefix of the full ranking (T20)") {
    val docs = corpus(150)
    val full = run(docs, Terms, 10000)
    run(docs, Terms, 12) shouldBe full.take(12)
  }

  test("equal-length docs rank by tf of the rarer term (T20)") {
    // "common" appears corpus-wide (low idf), "rare" in two docs (high
    // idf): more rare-tf must outrank more common-tf at equal length
    val filler = Seq.fill(10)("pad").mkString(" ")
    val docs = Seq(
      1L -> s"rare rare rare $filler", 2L -> s"rare common common $filler",
      3L -> s"common common common $filler", 4L -> filler) ++
      (10L to 15L).map(i => i -> s"common $filler pad pad")
    val ids = run(docs, Seq("rare", "common"), 20).map(_._1)
    ids.take(3) shouldBe Seq(1L, 2L, 3L)
    ids should not contain 4L // matches no query term
  }

  test("result is independent of input partitioning (T20)") {
    val docs = corpus(200)
    val df7 = docs.toDF("doc_id", "text").repartition(7)
    Search.bm25TopK(df7, "text", "doc_id", Terms, 25)
      .as[(Long, Long, Long)].collect().toSeq shouldBe run(docs, Terms, 25)
  }

  test("RRF fusion sums integer reciprocal ranks and orders by the sum (P9)") {
    import org.apache.spark.sql.functions.col
    val a = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("id", "rank")
    val b = Seq((2L, 1L), (4L, 2L)).toDF("id", "rank")
    val out = Search.rrfFuse(Seq(a, b), "id", k = 10)
      .as[(Long, Long, Long)].collect().toSeq
    // 1e6/(60+r) floor: r1=16393, r2=16129, r3=15873
    out shouldBe Seq(
      (2L, 2L, 16129L + 16393L), (1L, 1L, 16393L),
      (4L, 1L, 16129L), (3L, 1L, 15873L))
    // k truncates the fused list, not the inputs
    Search.rrfFuse(Seq(a, b), "id", k = 2)
      .as[(Long, Long, Long)].collect().toSeq shouldBe out.take(2)
    // withRank produces the 1-based dense order rrfFuse expects
    val ranked = Search.withRank(
      Seq((7L, 50L), (8L, 90L), (9L, 50L)).toDF("id", "score"),
      Seq(col("score").desc, col("id")))
      .as[(Long, Long, Long)].collect().toSeq
    ranked shouldBe Seq((8L, 90L, 1L), (7L, 50L, 2L), (9L, 50L, 3L))
  }
}
