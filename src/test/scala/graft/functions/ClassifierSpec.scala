package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** T21 hashed-linear quality classifier: kernel ≡ reference arithmetic,
  * and the frozen weights actually separate the planted corpus. */
class ClassifierSpec extends SparkSpec {

  import spark.implicits._

  private def refScore(toks: Seq[String]): Long =
    QualityClfWeights.BiasMu + toks.map { t =>
      var h = 0L
      var j = 0
      while (j < t.length) {
        val cp = t.codePointAt(j)
        h = (h * 31 + cp) % 1000000007L
        j += Character.charCount(cp)
      }
      QualityClfWeights.WeightsMu((h % QualityClfWeights.Buckets).toInt)
    }.sum

  test("kernel score equals reference fold (incl. unicode and empty tokens)") {
    val rows = Seq(
      Seq("buy", "cheap", "pills"),
      Seq("key", "agg", "row", "scan"),
      Seq(""),                       // polyhash("") = 0 -> bucket 0
      Seq("naïve", "λcalc", "日本語"), // code-point hashing, not UTF-16 units
      Seq.empty[String])
    val got = rows.toDF("toks")
      .select(QualityClassifier.scoreMu(col("toks")).as("s"))
      .as[Long].collect().toSeq
    got shouldBe rows.map(refScore)
  }

  test("frozen weights separate the planted-spam corpus at sf0.001") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val planted = docs.select(col("doc_id"),
      when(col("doc_id") % 5 === 0,
        concat(col("text"),
          lit(" buy cheap pills now click here free offer winner prize")))
        .otherwise(col("text")).as("text"))
    val scored = planted.select(col("doc_id"),
      QualityClassifier.scoreMu(
        split(lower(trim(col("text"))), "\\s+")).as("s"))
    scored.filter(col("doc_id") % 5 === 0 && col("s") > 0).count() shouldBe 0L
    scored.filter(col("doc_id") % 5 =!= 0 && col("s") <= 0).count() shouldBe 0L
  }

  test("spam-marker tokens carry negative weight, the bias is positive") {
    QualityClfWeights.BiasMu should be > 0L
    Seq("buy", "cheap", "pills", "click", "winner").foreach { t =>
      withClue(t) { refScore(Seq(t)) - QualityClfWeights.BiasMu should be < 0L }
    }
  }
}
