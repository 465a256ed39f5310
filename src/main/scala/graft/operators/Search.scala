package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{IntegralDivide, ShiftLeft}
import org.apache.spark.sql.graft.ColumnBridge

/** T20: inverted-index ranked keyword search — BM25 scoring in integer
  * units, the retrieval primitive the reference's `LIKE`-on-labels search
  * (wd2sql README.md:103-116) cannot express and every corpus-curation
  * loop needs ("find the docs about X, ranked", e.g. to audit what a
  * dedup or decontamination pass kept).
  *
  * Arithmetic is the W23 determinism trade taken one step further: BM25's
  * `ln`-based idf is replaced by a piecewise-linear fixed-point log2 in
  * MILLIBITS — exponent from the integer bit length, mantissa linearly
  * interpolated in thousandths — so the whole score is floor-division
  * arithmetic on longs, bit-identical on any engine/partitioning (double
  * `ln`/`/` would be libm- and accumulation-order-dependent; the
  * interpolated mantissa keeps the quantization under 0.09 bits,
  * spec-asserted, where a bare floor(log2) would step in whole bits).
  * Monotone in the true idf, so rankings agree with float BM25 up to
  * quantization ties.
  *
  * Formula, per query term t and doc d (all values BIGINT; div = floor):
  *   lennorm_pm = 1000 - BPM + (BPM * dl * n) div sdl        // ‰ of avgdl
  *   denom_pm   = tf * 1000 + (K1PM * lennorm_pm) div 1000
  *   sat_u      = (tf * (1000 + K1PM) * 1000000) div denom_pm
  *   q_t        = ((2n+2)^2 * 1024) div ((2*df+1)^2)         // ratio^2, Q10
  *   idf_mb     = (bitlen(q_t) - 11) * 1000
  *              + ((q_t - 2^(bitlen(q_t)-1)) * 1000) div 2^(bitlen(q_t)-1)
  *   score_u    = Σ_t idf_mb * sat_u
  * with k1 = 1.2 (K1PM = 1200), b = 0.75 (BPM = 750). The idf ratio is
  * Lucene's one-plus form (N+1)/(df+0.5) — squared for half-bit base
  * resolution before interpolation — so every matched term contributes
  * positively (Robertson's form goes negative past df > N/2, which on a
  * small-vocabulary corpus zeroes every common term).
  *
  * Scale shape: one explode over the corpus feeding BOTH per-doc lengths
  * and the postings; the postings frame filters to the query's terms
  * BEFORE the (doc, term) aggregation, so the tf/df shuffles carry only
  * matching occurrences (query-sized, not corpus-sized). Corpus totals
  * (n, sdl) ride as a 1-row broadcast inside the plan (no driver-side
  * count pass — the t5 idiom), and the per-term idf frame (≤ |query|
  * rows) broadcasts into the scoring join. df is exact per term because
  * each term's postings are complete. The final top-k is orderBy+limit →
  * TakeOrderedAndProject: per-partition k-heaps + driver merge, no global
  * sort. A SERVED index would materialize the postings bucketed by term
  * (R17) so a query reads only its terms' buckets; this operator is the
  * scan-side formulation that also defines the scoring contract.
  */
object Search {

  val K1PM = 1200L // k1 = 1.2 in per-mille
  val BPM  = 750L  // b = 0.75 in per-mille

  /** True integer floor division on longs (Column `/` widens to double,
    * which past 2^53 silently loses exactness — the whole point here). */
  private[operators] def idiv(a: Column, b: Column): Column =
    ColumnBridge.column(IntegralDivide(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Shared tokenizer contract (t5/t9/t18): lower, trim, split on \s+. */
  def toks(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Fixed-point log2 in millibits of `q` (a Q10-scaled ratio^2, so
    * ≥ 1024): exponent from the bit length, mantissa interpolated. */
  def log2MillibitsQ10(q: Column): Column = {
    val e   = (length(bin(q)) - 1).cast("long")
    val pow = ColumnBridge.column(ShiftLeft(
      ColumnBridge.expression(lit(1L)), ColumnBridge.expression(e.cast("int"))))
    (e - 10L) * 1000L + idiv((q - pow) * 1000L, pow)
  }

  /** The inverted-index grain: (`idCol`, `term`, `tf`) postings and
    * (`idCol`, `dl`) lengths from a raw corpus — also the per-batch unit
    * X17's streaming index appends (each doc lands whole in one batch, so
    * cross-batch df/avgdl aggregate correctly over the appended state). */
  def indexComponents(docs: DataFrame, textCol: String, idCol: String)
      : (DataFrame, DataFrame) = {
    val tokens = docs.select(col(idCol), explode(toks(col(textCol))).as("term"))
    (tokens.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf")),
      tokens.groupBy(idCol).agg(count(lit(1)).as("dl")))
  }

  /** BM25 top-k: the `k` highest-scoring docs for `queryTerms`, as
    * (idCol, n_terms_hit, score_u) ordered by (score_u desc, id asc).
    * Docs matching no query term are not returned. */
  def bm25TopK(docs: DataFrame, textCol: String, idCol: String,
      queryTerms: Seq[String], k: Int): DataFrame = {
    val tokens = docs.select(col(idCol), explode(toks(col(textCol))).as("term"))
    val dl = tokens.groupBy(idCol).agg(count(lit(1)).as("dl"))
    // postings restricted to the query BEFORE aggregation: the tf shuffle
    // ships only matching occurrences
    val tf = tokens.filter(col("term").isin(queryTerms: _*))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    scoreComponents(tf, dl, idCol, queryTerms, k)
  }

  /** Attach a 1-based `rank` column by the given total order. Inputs here
    * are ALREADY top-k lists (bounded by construction), so the global
    * row_number window is k rows on one partition — never corpus-sized;
    * ranking a full corpus goes through the TopK plan node instead. */
  def withRank(df: DataFrame, order: Seq[Column]): DataFrame =
    df.withColumn("rank",
      row_number().over(org.apache.spark.sql.expressions.Window.orderBy(order: _*))
        .cast("long"))

  /** P9: reciprocal-rank fusion — the standard hybrid-retrieval combiner
    * (Cormack et al., SIGIR'09): each input list contributes
    * floor(1e6 / (kRrf + rank)) integer micro-units per doc, docs are
    * re-ranked by the summed contribution. Keyword (BM25) and vector (ANN)
    * rankings fuse without score normalization — only RANKS matter, so the
    * incomparable score scales (integer BM25 units vs cosine) never meet.
    * Integer floor arithmetic keeps the fused score engine-exact.
    *
    * Each input must carry `idCol` and a 1-based `rank` ([[withRank]]).
    * Returns (idCol, n_lists, rrf_u) — the top `k` by (rrf_u desc, id) —
    * with n_lists = how many input lists surfaced the doc. Scale shape:
    * inputs are top-k lists, so the union, the groupBy and the final
    * TakeOrdered all run on k·lists rows — the heavy lifting happened in
    * the retrieval operators upstream. */
  def rrfFuse(lists: Seq[DataFrame], idCol: String, k: Int, kRrf: Int = 60): DataFrame = {
    require(lists.nonEmpty && k > 0 && kRrf >= 0)
    val union = lists.map(_.select(col(idCol), col("rank"))).reduce(_ unionAll _)
    union.groupBy(idCol)
      .agg(count(lit(1)).as("n_lists"),
        sum(idiv(lit(1000000L), lit(kRrf.toLong) + col("rank"))).as("rrf_u"))
      .orderBy(col("rrf_u").desc, col(idCol))
      .limit(k)
  }

  /** The scoring tail over inverted-index components — shared by
    * [[bm25TopK]] (fresh tokenization) and X17's streaming index (state
    * tables). `tf` may carry extra terms; it is re-filtered to the query
    * here so both callers get identical semantics. */
  def scoreComponents(tfAll: DataFrame, dl: DataFrame, idCol: String,
      queryTerms: Seq[String], k: Int): DataFrame = {
    require(queryTerms.nonEmpty && k > 0)
    // Caches-owned: without it Spark re-derives each sub-plan per consumer
    // — the plan audit showed FOUR corpus scans / three full explodes
    // (df re-exploding the corpus instead of reading tf; dl recomputed for
    // the corpus totals and again for the scoring join). Owning the two
    // frames makes the corpus tokenize once per path: tf is query-sized,
    // dl is (id, long) per doc — both cheap to hold, released by the
    // consumer via Caches.releaseAll (the lshTopK discipline).
    val tf = Caches.owned(tfAll.filter(col("term").isin(queryTerms: _*)))
    val dlC = Caches.owned(dl)
    // corpus totals as a 1-row broadcast INSIDE the plan (t5 idiom)
    val corpus = dlC.agg(count(lit(1)).as("n"), sum("dl").as("sdl"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val qT = idiv((lit(2L) * col("n") + 2L) * (lit(2L) * col("n") + 2L) * 1024L,
      (lit(2L) * col("df") + 1L) * (lit(2L) * col("df") + 1L))
    val idf = dfreq.crossJoin(broadcast(corpus))
      .select(col("term"), log2MillibitsQ10(qT).as("idf_mb"),
        col("n"), col("sdl"))
    val lennormPm = lit(1000L) - BPM + idiv(lit(BPM) * col("dl") * col("n"), col("sdl"))
    val denomPm = col("tf") * 1000L + idiv(lit(K1PM) * col("lennorm_pm"), lit(1000L))
    val satU = idiv(col("tf") * (1000L + K1PM) * 1000000L, denomPm)
    tf.join(broadcast(idf), "term").join(dlC, idCol)
      .withColumn("lennorm_pm", lennormPm)
      .withColumn("score_term", col("idf_mb") * satU)
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_terms_hit"), sum("score_term").as("score_u"))
      .orderBy(col("score_u").desc, col(idCol))
      .limit(k)
  }
}
