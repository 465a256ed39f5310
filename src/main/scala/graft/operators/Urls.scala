package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** D15: URL canonicalization + URL-level dedup (SURVEY.md §2.3).
  *
  * Web-crawl corpora reach the pipeline keyed by URL, and the same page
  * hides behind many spellings: scheme/host case, `www.`, an explicit
  * default port, a trailing slash, shuffled query parameters, tracking
  * params (`utm_*`, `gclid`, `fbclid`, `ref`) and fragments. Content-level
  * dedup (D1-D5) eventually catches the duplicate BODIES, but URL-level
  * dedup is the cheap first pass every crawl pipeline runs — it needs no
  * content fetch at all, so it prunes refetches and trivially-duplicated
  * docs for the cost of a string projection + one hash shuffle.
  *
  * The canonical form, each step a documented contract the DuckDB oracle
  * replays generically:
  *
  *   1. scheme and host lowercased;
  *   2. the scheme's default port stripped (`:80` http, `:443` https);
  *   3. leading `www.` stripped;
  *   4. fragment dropped;
  *   5. tracking params dropped (`utm_*`, `gclid`, `fbclid`, `ref`);
  *   6. surviving query params sorted bytewise;
  *   7. one trailing path slash stripped (root `/` kept; empty path → `/`).
  *
  * Everything is built-in codegen'd string/array functions — no UDF, no
  * custom expression needed — so canonicalization fuses into the scan.
  * The dedup is D1's shape: hash-shuffle on the canonical string with
  * map-side partial `min`, survivor = lowest doc id. At 100 TB the shuffle
  * ships (canon, id) pairs only, never text.
  */
object Urls {

  /** Pipe-joined prefixes whose `key=` params are dropped (step 5). */
  val TrackingParams = "utm_[^=]*|gclid|fbclid|ref"

  /** Canonical form of an absolute `scheme://...` URL (see class doc).
    * Delegates to the concrete catalyst tree in
    * [[graft.functions.NativeExpressions.canonicalizeUrlExpr]] — one
    * formulation shared with the SQL registry's `canonicalize_url`. */
  def canonicalizeUrl(url: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.NativeExpressions.canonicalizeUrlExpr(
      ColumnBridge.expression(url)))
  }

  /** URL-level dedup: one survivor per canonical URL — the row with the
    * lowest `idCol` (deterministic, like D1's min-winner). Returns
    * (idCol, canon_url) for the survivors. Rows WITHOUT a URL (null in,
    * null canon out) are all kept: "no URL" is absence of the dedup key,
    * not a shared key — grouping them would silently collapse every
    * url-less doc to one survivor. */
  def dedupByUrl(df: DataFrame, idCol: String, urlCol: String): DataFrame = {
    val canon = df.select(col(idCol), canonicalizeUrl(col(urlCol)).as("canon_url"))
    canon.filter(col("canon_url").isNotNull)
      .groupBy("canon_url")
      .agg(min(col(idCol)).as(idCol))
      .select(col(idCol), col("canon_url"))
      .unionByName(canon.filter(col("canon_url").isNull))
  }
}
