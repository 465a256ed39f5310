package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url").select(Urls.canonicalizeUrl(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq

  test("spelling variants collapse to one canonical form (D15)") {
    val variants = Seq(
      "https://example.com/a/b?x=1&y=2",
      "HTTPS://WWW.Example.COM/a/b?y=2&x=1",
      "https://example.com:443/a/b/?x=1&y=2#frag",
      "https://www.example.com/a/b?y=2&utm_campaign=spring&x=1&fbclid=abc")
    canon(variants: _*).distinct shouldBe Seq("https://example.com/a/b?x=1&y=2")
  }

  test("only the scheme's default port is stripped (D15)") {
    canon(
      "http://h.com:80/p", "http://h.com:443/p",
      "https://h.com:443/p", "https://h.com:80/p",
      "https://h.com:8443/p", "ftp://h.com:21/p") shouldBe Seq(
      "http://h.com/p", "http://h.com:443/p",
      "https://h.com/p", "https://h.com:80/p",
      "https://h.com:8443/p", "ftp://h.com:21/p")
  }

  test("path and query edge cases (D15)") {
    // empty path -> "/", root slash kept, exactly one trailing slash drops,
    // empty query drops the "?", ref= is tracking but refresh= is not
    canon(
      "https://h.com", "https://h.com/", "https://h.com/a/",
      "https://h.com/a?", "https://h.com/a?ref=nav",
      "https://h.com/a?refresh=1&a=2") shouldBe Seq(
      "https://h.com/", "https://h.com/", "https://h.com/a",
      "https://h.com/a", "https://h.com/a", "https://h.com/a?a=2&refresh=1")
  }

  test("dedupByUrl keeps the lowest id per canonical URL (D15)") {
    val docs = Seq(
      (7L, "https://example.com/x"),
      (3L, "HTTPS://www.example.com/x/"),
      (5L, "https://example.com:443/x#top"),
      (9L, "https://example.com/y")).toDF("doc_id", "url")
    val kept = Urls.dedupByUrl(docs, "doc_id", "url")
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    kept shouldBe Seq(
      (3L, "https://example.com/x"), (9L, "https://example.com/y"))
  }

  test("url-less rows never dedup against each other (D15)") {
    val docs = Seq(
      (1L, null.asInstanceOf[String]),
      (2L, null.asInstanceOf[String]),
      (3L, "https://example.com/x"),
      (4L, "https://EXAMPLE.com/x/")).toDF("doc_id", "url")
    val kept = Urls.dedupByUrl(docs, "doc_id", "url")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSeq
    kept shouldBe Seq((1L, None), (2L, None),
      (3L, Some("https://example.com/x")))
  }
}
