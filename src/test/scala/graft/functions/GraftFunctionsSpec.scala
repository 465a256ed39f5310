package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SQL-surface parity: every native kernel is callable from plain SQL and
  * agrees with its Column API form. */
class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "an entirely different sentence about query engines")
  ).toDF("id", "text")

  test("registered SQL functions match the Column API") {
    docs.createOrReplaceTempView("fn_docs")
    val viaSql = spark.sql(
      """SELECT id,
        |  poly_fingerprint(text) AS fp,
        |  simhash64(word_shingles(split(lower(trim(text)), '\\s+'), 1)) AS sh,
        |  minhash_signature(word_shingles(split(lower(trim(text)), '\\s+'), 3), 16) AS mh
        |FROM fn_docs""".stripMargin).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getSeq[Long](3))).toSet

    val viaCols = docs.select(col("id"),
      graft.operators.TextAnalysis.fingerprint(col("text")).as("fp"),
      graft.operators.Dedup.simhash(col("text")).as("sh"),
      NativeExpressions.minhashSignature(
        NativeExpressions.wordShingleHashes(split(lower(trim(col("text"))), "\\s+"), 3), 16).as("mh"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getSeq[Long](3))).toSet

    viaSql shouldBe viaCols
  }

  test("bpe_token_count works in SQL and matches the Column API") {
    docs.createOrReplaceTempView("fn_docs")
    val viaSql = spark.sql("SELECT id, bpe_token_count(text) AS n FROM fn_docs")
      .as[(Long, Long)].collect().toSet
    val viaCols = docs.select(col("id"), Bpe.tokenCount(col("text")).as("n"))
      .as[(Long, Long)].collect().toSet
    viaSql shouldBe viaCols
  }

  test("misra_gries aggregates in SQL, per group, and matches the Column API") {
    val xs = ((0 until 900).map(_ => 7L) ++ (0 until 300).map(i => 1000L + i))
      .zipWithIndex.map { case (k, i) => (i % 2, k) }
    xs.toDF("g", "k").createOrReplaceTempView("fn_stream")
    val viaSql = spark.sql(
      "SELECT g, misra_gries(k, 4) AS c FROM fn_stream GROUP BY g ORDER BY g")
      .as[(Int, Seq[Long])].collect().toSeq
    val viaCols = xs.toDF("g", "k").groupBy("g")
      .agg(FrequentItems.misraGries(col("k"), 4).as("c"))
      .orderBy("g").as[(Int, Seq[Long])].collect().toSeq
    viaSql.map(_._1) shouldBe Seq(0, 1)
    // candidate sets are merge-order dependent; the GUARANTEE is not:
    // the 75%-frequency key must be a candidate on both paths
    viaSql.foreach { case (_, c) => c should contain(7L) }
    viaCols.foreach { case (_, c) => c should contain(7L) }
  }

  test("cosine_sim and hyperplane_bucket work in SQL with literal params") {
    val row = spark.sql(
      """SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
        |  hyperplane_bucket(array(1.0D, 0.0D), 4, 2, 42) AS b""".stripMargin).collect().head
    row.getDouble(0) shouldBe 1.0 +- 1e-12
    row.getInt(1) should (be >= 0 and be < 16)
  }

  test("non-literal int parameter is rejected with a clear error") {
    docs.createOrReplaceTempView("fn_docs")
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_signature(word_shingles(split(text, ' '), 3), id) FROM fn_docs")
        .collect()
    }
    e.getMessage should include("literal integer")
  }
  test("sign_pack and sign_dot work in SQL and agree with each other (S15)") {
    // +1,-1,+1,-1 pattern over 4 dims: word 0 = 0b0101 = 5; the asymmetric
    // dot of the vector against its own signs is the L1 norm
    val row = spark.sql(
      """SELECT sign_pack(array(1.0D, -2.0D, 3.0D, -4.0D)) AS w,
        |  sign_dot(array(1.0D, -2.0D, 3.0D, -4.0D),
        |           sign_pack(array(1.0D, -2.0D, 3.0D, -4.0D))) AS s""".stripMargin)
      .collect().head
    row.getSeq[Long](0) shouldBe Seq(5L)
    row.getDouble(1) shouldBe 10.0 +- 1e-12
  }

  test("normalize_text and canonicalize_url on the SQL surface (T26/D15)") {
    val row = spark.sql(
      """SELECT normalize_text('  a  b' || char(13) || char(10) || 'c  ') AS n,
        |  canonicalize_url('HTTPS://WWW.Ex.COM:443/a/?b=2&utm_source=x&a=1#f') AS u
        |""".stripMargin).collect().head
    row.getString(0) shouldBe "a b\nc"
    row.getString(1) shouldBe "https://ex.com/a?a=1&b=2"
  }
}
