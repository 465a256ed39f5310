package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash sampling and dataset splits (SURVEY.md §2.3 T6).
  *
  * Training pipelines need REPRODUCIBLE sampling: `df.sample()` draws from
  * a per-partition RNG, so the subset changes with partitioning, retries
  * and cluster size — useless for a train/val/test split that must be
  * stable across reruns and engines. Here membership is a pure function of
  * the row's id: the first 8 hex chars of md5(id) give a uniform 32-bit
  * value, compared against exact integer thresholds. Same id → same split,
  * on any cluster, any day, any engine (md5 agrees everywhere), and the
  * whole thing is one codegen'd projection — no shuffle, no RNG state.
  */
object Sampling {

  /** Uniform u ∈ [0, 2^32) derived from the id. */
  def hashUnit(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long")

  /** Keep a deterministic `fraction` of rows (by id hash). */
  def hashSample(df: DataFrame, idCol: String, fraction: Double): DataFrame =
    df.filter(hashUnit(col(idCol)) < math.round(fraction * 4294967296.0))

  /** Add a `split` column assigning each row to a named fraction, e.g.
    * `Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)` (order matters;
    * fractions must sum to ~1). Thresholds are exact longs so the oracle
    * can mirror them digit-for-digit. */
  def assignSplits(df: DataFrame, idCol: String,
      splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "split fractions must sum to 1")
    val thresholds = cumulativeThresholds(splits)
    val u = hashUnit(col(idCol))
    val expr = thresholds.init.foldRight(lit(thresholds.last._1): Column) {
      case ((name, upper), rest) => when(u < upper, name).otherwise(rest)
    }
    df.withColumn("split", expr)
  }

  /** T17: deterministic global corpus shuffle — the training-order
    * operation every pretraining pipeline runs before packing: examples
    * must arrive in a reproducible pseudorandom order (same order on any
    * cluster size, any rerun, any retry — a per-partition RNG gives none
    * of that), and changing `seed` gives an independent order for the next
    * epoch without touching the data.
    *
    * The order IS the key: shuffle_key = md5(seed ':' id), a pure function
    * of (seed, id). Materialization is range-partition by key + sort
    * within partitions — a TOTAL order across output files (file i's keys
    * all precede file i+1's), so a sequential reader consumes the corpus
    * in shuffle order with zero coordination, while the sort itself is
    * distributed (no global window, no single-partition funnel — ordering
    * by row_number() would ship the corpus through one task).
    */
  def shuffleKey(id: Column, seed: Long): Column =
    md5(concat_ws(":", lit(seed), id.cast("string")))

  def globalShuffle(df: DataFrame, idCol: String, seed: Long = 42L,
      partitions: Int = 0): DataFrame = {
    val keyed = df.withColumn("shuffle_key", shuffleKey(col(idCol), seed))
    val ranged = if (partitions > 0)
      keyed.repartitionByRange(partitions, col("shuffle_key"))
    else keyed.repartitionByRange(col("shuffle_key"))
    ranged.sortWithinPartitions("shuffle_key")
  }

  /** Deterministic stratified sample: exactly `n` rows per stratum (fewer if
    * the stratum is smaller), chosen by md5(id) order — the training-data
    * "balance by language/source" operation. Membership is a pure function of
    * (stratum, id) like the splits above: same rows on any cluster, any rerun,
    * any engine. The per-stratum selection runs through the bounded-heap
    * `TopK` plan node (SURVEY §2.2 P1) — O(n) state per stratum per partition
    * and shuffle volume ≤ strata × n × partitions, where a window row_number
    * would sort each stratum's full contents on a single partition (a
    * boilerplate-language stratum at 100 TB is most of the corpus).
    */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String, n: Int): DataFrame =
    graft.plans.TopK.perGroupOrdered(
        df.withColumn("__u", md5(col(idCol).cast("string"))),
        Seq(strataCol), Seq("__u" -> true, idCol -> true), n)
      .drop("__u")

  /** T11: temperature-based source rebalancing — materialize a ~`targetTotal`-row
    * corpus whose per-stratum share follows n_s^(1/2) instead of n_s (the
    * "temperature sampling" data-mixing step of multilingual/multi-source
    * training, α = 0.5): big sources are down-weighted, small sources kept.
    *
    * Determinism rules: weights are INTEGER square roots (w_s = floor(√n_s) is
    * exact in IEEE double for any stratum count below ~2^44) and quotas are
    * integer division (M·w_s div Σw_s), so every engine computes identical
    * quotas; membership is md5(id) order per stratum, the same pure-function
    * selection as `hashSample`/`stratifiedSample` — same rows on any cluster,
    * any partitioning, any engine.
    *
    * Scale shape: per-stratum counts and quotas are a strata-sized frame (one
    * tiny driver action to learn max quota — the only driver data, like
    * IvfAnn's centroids); candidate ranking runs through the bounded-heap
    * TopK plan node, so state is O(maxQuota) per stratum per partition and
    * the row_number tiebreak below it only ever sees the ≤ strata × maxQuota
    * heap survivors, never the corpus. The final semi-join carries NO
    * broadcast hint: a real resample of a 100 TB corpus picks billions of
    * ids (targetTotal-sized, far past any broadcast threshold), so the
    * planner/AQE must stay free to shuffle it — at gate scale AQE broadcasts
    * the small side on its own. The semi-join keys on (stratum, id) so ids
    * only unique WITHIN a stratum cannot pull rows across strata. */
  def temperatureResample(df: DataFrame, strataCol: String, idCol: String,
      targetTotal: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__n"))
    val weights = counts
      .withColumn("__w", floor(sqrt(col("__n").cast("double"))).cast("long"))
    // Σw via a 1-row agg cross join, not a partition-less window: same
    // strata-sized math without the all-to-one-partition window shape
    val quotas = weights
      .crossJoin(weights.agg(sum("__w").as("__z")))
      .withColumn("__quota", expr(s"($targetTotal * __w) div __z"))
      .select(col(strataCol), col("__quota"))
    // null on an empty input; 0 when every quota rounds down to nothing —
    // both mean "select no rows", not an NPE or a k=0 heap
    val maxQuota = Option(quotas.agg(max("__quota")).head().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L).toInt
    if (maxQuota <= 0) return df.limit(0)
    val ranked = graft.plans.TopK.perGroupOrdered(
      df.select(col(strataCol), col(idCol))
        .withColumn("__u", md5(col(idCol).cast("string"))),
      Seq(strataCol), Seq("__u" -> true, idCol -> true), maxQuota)
    val picked = ranked
      .withColumn("__rk", row_number().over(
        Window.partitionBy(strataCol).orderBy(col("__u"), col(idCol))))
      .join(quotas, Seq(strataCol))
      .filter(col("__rk") <= col("__quota"))
      .select(col(strataCol), col(idCol))
    // using-column joins surface the keys first; restore the caller's order
    df.join(picked, Seq(strataCol, idCol), "left_semi")
      .select(df.columns.map(col): _*)
  }

  /** P10: token-budget mixture materialization — the "data mixing" step
    * that turns a mixture recipe (DoReMi/Pile-style per-source weights)
    * into an actual sampled corpus: given per-stratum target shares and a
    * total token budget, keep a deterministic hash-sample of each stratum
    * sized so its expected token mass hits `budget × share`.
    *
    * Determinism rules: shares are INTEGER per-mille (must sum to 1000 —
    * a recipe, not a suggestion), per-stratum targets are floor division,
    * and the acceptance threshold is floor(target × 2^32 / total) computed
    * in DECIMAL(38,0) so the multiply cannot overflow at real token
    * totals (2^32 × a 100 TB corpus' tokens ≈ 1e23 ≫ 2^63; integral
    * division on decimals is still exact floor). Membership is then the
    * T6 rule — hashUnit(id) < threshold, a pure function of the id — so
    * the sample is reproducible on any engine and any partitioning, and
    * strata with total ≤ target keep every row (threshold caps at 2^32).
    * Realized token mass tracks the target in expectation (hash sampling
    * draws rows, not tokens); exact-mass packing is T12's job downstream.
    *
    * Scale shape: one map-side-combined groupBy for the strata totals (a
    * strata-sized frame), a broadcast join of thresholds back onto the
    * corpus, and a codegen'd filter — the corpus is read once and never
    * shuffled. Strata absent from `sharesPm` get share 0 (dropped).
    *
    * Returns the accepted rows: (idCol, strataCol, massCol). */
  def budgetMixture(df: DataFrame, idCol: String, strataCol: String,
      massCol: String, sharesPm: Seq[(String, Long)], budget: Long): DataFrame = {
    require(sharesPm.nonEmpty && sharesPm.map(_._2).sum == 1000L,
      s"mixture shares must be per-mille summing to 1000, got ${sharesPm.map(_._2).sum}")
    require(sharesPm.map(_._1).distinct.size == sharesPm.size,
      "duplicate stratum in mixture shares") // a dup would double its rows via the join
    require(budget > 0, "budget must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val targets = sharesPm.toDF(strataCol, "__pm")
      .withColumn("__target", expr(s"($budget * __pm) div 1000"))
    val totals = df.groupBy(col(strataCol))
      .agg(sum(col(massCol).cast("long")).as("__total"))
    val thresholds = totals.join(targets, Seq(strataCol))
      .withColumn("__thresh",
        when(col("__total") <= col("__target"), lit(4294967296L))
          .otherwise(expr(
            "(CAST(__target AS DECIMAL(38,0)) * 4294967296) div CAST(__total AS DECIMAL(38,0))")))
      .select(col(strataCol), col("__thresh"))
    df.select(col(idCol), col(strataCol), col(massCol))
      .join(broadcast(thresholds), Seq(strataCol))
      .filter(hashUnit(col(idCol)) < col("__thresh"))
      .select(col(idCol), col(strataCol), col(massCol))
  }

  /** T15: leakage-safe train/val/test splits — near-duplicate documents
    * must never straddle a split boundary, or the eval slice "tests" on
    * paraphrases of training rows and overstates quality (the
    * train/test-contamination failure D7 scrubs AFTER the fact; this
    * prevents it at split time). The split is assigned to the dedup
    * CLUSTER, not the document: connected components over the near-dup
    * pair graph (D6 machinery) label each doc with its cluster's canonical
    * min-id, and the T6 md5-threshold assignment keys on that component id
    * — every member of a cluster inherits the same split, while singleton
    * docs (component = own id) keep T6's exact per-doc behavior.
    *
    * Scale shape: CC is the D6 path (large-star/small-star, O(log n)
    * rounds); the assignment itself is one codegen'd projection. Split
    * fractions hold approximately (clusters are weighted by size), which
    * is the correct trade — fraction drift is bounded by the dup rate,
    * leakage is zero by construction. */
  def clusterSafeSplits(docs: DataFrame, idCol: String, pairs: DataFrame,
      splits: Seq[(String, Double)]): DataFrame =
    assignSplits(
        ConnectedComponents.labels(docs.select(col(idCol)), pairs),
        "component", splits)
      .withColumnRenamed("id", idCol)

  /** P6: ontology-aware curation — the topical analogue of T15. Select the
    * documents whose `topicCol` is transitively under `root` in a
    * (child, parent) category ontology (W20's closure — the wdt:P279+
    * shape), then assign train/val/test by each topic's ancestor among
    * `groupNodes` (a chosen mid-level category tier): every document in
    * the same fine-grained category subtree inherits ONE split, so
    * near-paraphrase families that live inside a narrow topic can't leak
    * across the train/eval boundary even when no textual near-dup edge
    * connects them (the failure T15's pair graph can't see).
    *
    * Contract: selection is strict `+` descendants of `root` (a doc whose
    * topic IS the root is out — topics are normally leaves; pre-union the
    * reflexive pair if needed). A topic maps to its minimum ancestor-or-
    * self in `groupNodes` (min makes nested group tiers deterministic);
    * a topic with no group ancestor keys on itself — T15's singleton rule.
    *
    * Scale shape: the closure materializes once over the ONTOLOGY subgraph
    * (classes, not the 100 TB corpus) with W20's checkpointed doubling;
    * both derived sides (`root` descendants, group mapping) are
    * category-sized, so the corpus-side joins are a semi-join and a left
    * join that AQE broadcasts at runtime — no static hint, per the T11
    * rule: a hint would be wrong if a category tier ever outgrows the
    * broadcast budget. The corpus itself never shuffles; the split is
    * T6's codegen'd projection. */
  def ontologySafeSplits(docs: DataFrame, topicCol: String, edges: DataFrame,
      root: Long, groupNodes: DataFrame, splits: Seq[(String, Double)]): DataFrame = {
    val cl = PropertyPath.closure(edges)
    val under = cl.filter(col("dst") === root).select(col("src").as(topicCol))
    val gcol = groupNodes.columns.head
    val gn = groupNodes.select(col(gcol).cast("long").as("dst"))
    val mapping = cl.unionByName(gn.select(col("dst").as("src"), col("dst")))
      .join(gn, Seq("dst"), "left_semi")
      .groupBy(col("src").as("__topic")).agg(min(col("dst")).as("component"))
      .select(col("__topic"), col("component"))
    val selected = docs.join(under, Seq(topicCol), "left_semi")
    val labeled = selected
      .join(mapping, selected(topicCol) === mapping("__topic"), "left")
      .withColumn("component",
        coalesce(col("component"), col(topicCol).cast("long")))
      .drop("__topic")
    assignSplits(labeled, "component", splits)
  }

  /** T19: deterministic weighted sampling WITHOUT replacement — k rows
    * drawn so each successive pick lands on row i with probability
    * w_i / (remaining weight), the Plackett–Luce scheme behind
    * quality-weighted corpus subsetting ("sample 10M docs, prefer high
    * quality score"). Mechanism: expand row i conceptually into w_i
    * copies, give every copy the deterministic key md5(seed:id:j), and
    * keep the k rows with the smallest per-row MIN copy key. A uniform
    * random order over copies, collapsed to first occurrence per row, IS
    * successive weighted sampling — and min-of-w_i hashes reproduces it
    * without materializing copies. Everything is a pure function of
    * (seed, id, w): same k rows on any engine, cluster, or rerun
    * (the [[hashSample]] reproducibility contract, weight-aware).
    *
    * Weights are positive integers (rows with w < 1 are excluded); keep
    * them modest (≤ ~1000) — each row computes w hashes in one codegen'd
    * projection. Selection is orderBy+limit, which plans as
    * TakeOrderedAndProject: a k-heap per partition and a k-merge on the
    * driver — no global sort shuffle, no single-partition funnel. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int, seed: Long = 7L): DataFrame = {
    val keyed = df.filter(col(weightCol) >= 1).withColumn("__wk",
      array_min(transform(sequence(lit(1), col(weightCol).cast("int")),
        j => md5(concat_ws(":", lit(seed), col(idCol).cast("string"), j)))))
    keyed.orderBy(col("__wk")).limit(k).drop("__wk")
  }

  /** (name, exclusive upper bound in [0, 2^32]) per split, cumulative. */
  def cumulativeThresholds(splits: Seq[(String, Double)]): Seq[(String, Long)] = {
    var acc = 0.0
    splits.map { case (name, f) =>
      acc += f
      name -> math.round(acc * 4294967296.0)
    }
  }
  /** T25: DSIR-shaped importance weighting — "which raw documents look
    * like the target distribution?", the data-selection signal behind
    * importance-resampled pretraining mixes (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling"). Two
    * bag-of-hashed-unigrams multinomials are fitted in ONE corpus pass —
    * the target model over documents matching `isTarget`, the raw model
    * over all of `docs` — and every document scores its token stream's
    * log-likelihood ratio under them:
    *
    *   score_u(d) = Σ_tokens lr_mb(bucket(tok)),
    *   lr_mb(b)   = log2-millibits of (tb_b+1)(Rtot+B) / ((rb_b+1)(Ttot+B))
    *
    * with bucket(tok) = the t4 polynomial hash mod `buckets` (the T21
    * bucketing) and the log2 the T20 fixed-point millibit kernel — so the
    * whole estimator is INTEGER arithmetic end to end: deterministic on
    * any engine or partitioning, replayed digit-for-digit by the DuckDB
    * oracle, no float log whose last ulp could flip a selection. score_u >
    * 0 means "more target-like than raw-like" (the add-one-smoothed models
    * make that calibration exact), which gives a rank-free distributed
    * selection rule: no global sort, no window funnel — each partition
    * filters locally.
    *
    * Scale shape: the canonical two-pass DSIR — pass 1 tokenizes and
    * aggregates bucket stats map-side to ≤ `buckets` rows (pinned via
    * [[Caches]], so the totals action, the ratio frame and the broadcast
    * all reuse ONE materialization instead of re-tokenizing the corpus);
    * pass 2 re-tokenizes for the per-doc scores, a map-side groupBy on
    * (id, bucket) then a broadcast join — nothing shuffles the corpus
    * except the (id, bucket, count) triples whose cardinality is ≤
    * tokens. Totals are two driver longs. At cluster scale mind the
    * (tb+1)·(Rtot+B) product against 2^63: shed a common factor from both
    * totals first (the ratio is what matters) — with 2^40-token corpora,
    * idiv both totals by 2^20 before calling.
    *
    * Returns (idCol, score_u, selected) — TOTAL over docs: zero-token
    * documents score 0 and are not selected. */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int = 512): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val bk = docs
      .select(col(idCol), isTarget.as("__tgt"),
        explode(Search.toks(col(textCol))).as("__tok"))
      .select(col(idCol), col("__tgt"),
        (TextAnalysis.fingerprint(col("__tok")) % buckets).as("__b"))
    val stats = Caches.owned(bk.groupBy("__b").agg(
      count(lit(1)).as("__rb"),
      sum(when(col("__tgt"), 1L).otherwise(0L)).as("__tb")))
    // two driver-side longs — the only action the fit needs
    val tot = stats.agg(
      coalesce(sum("__rb"), lit(0L)), coalesce(sum("__tb"), lit(0L))).head()
    val (rtot, ttot) = (tot.getLong(0), tot.getLong(1))
    require(ttot > 0, "importanceWeights: the target selector matches no tokens")
    val ratioQ10 = greatest(Search.idiv(
      (col("__tb") + 1L) * lit(rtot + buckets) * 1024L,
      (col("__rb") + 1L) * lit(ttot + buckets)), lit(1L))
    val lr = stats.select(col("__b"), Search.log2MillibitsQ10(ratioQ10).as("__lr_mb"))
    val perDoc = bk.groupBy(col(idCol), col("__b")).agg(count(lit(1)).as("__c"))
      .join(broadcast(lr), "__b")
      .groupBy(idCol).agg(sum(col("__c") * col("__lr_mb")).as("score_u"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("score_u"), lit(0L)).as("score_u"))
      .withColumn("selected", col("score_u") > 0L)
  }
}
