package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines (SURVEY.md §2.3 D1-D5).
  *
  * Scale design: nothing here ever cross-joins the corpus. Exact dedup
  * shuffles once on a content hash; MinHash/SimHash shuffle on *bucket keys*
  * (LSH bands / hamming blocks), so candidate-pair generation is bounded by
  * bucket sizes, and only candidates pay the exact-verification cost — the
  * standard way near-dedup stays O(n·bands) instead of O(n²) at 100 TB.
  */
object Dedup {

  /** D1: exact dedup on normalized content. Returns the winning row per
    * content group (min id wins, matching a deterministic "first wins"
    * policy). One shuffle on the 128-bit content hash, map-side partial agg.
    */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val hashed = df.withColumn("__h", md5(col(textCol)))
    val winners = hashed.groupBy(col("__h"))
      .agg(min(col(idCol)).as(idCol))
      .select(idCol)
    df.join(winners, Seq(idCol), "left_semi")
  }

  /** Per-group dup statistics (content_hash, keep_id, n_copies). */
  def dupStats(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Word-shingle hashes as a `__sh` column via the native
    * `WordShingleHashes` kernel: one tokenize, one primitive two-loop pass
    * (per-token xxhash64 + k-window mix). The earlier HOF formulation
    * (`transform(sequence, i -> xxhash64(concat_ws(slice(...))))`) evaluated
    * interpreted and allocated a concatenated string per shingle per row —
    * the dominant cost of every shingle operator at sf0.1.
    */
  private def withShingleHashes(df: DataFrame, textCol: String, k: Int): DataFrame =
    df.withColumn("__sh",
      graft.functions.NativeExpressions.wordShingleHashes(
        split(lower(trim(col(textCol))), "\\s+"), k))

  /** Distinct word-shingle hash sets per document: (id, __set), SORTED
    * ascending — the sorted-merge verification kernel
    * (`sortedOverlapCount`) requires it, and the sort costs one in-register
    * pass at staging time instead of a hash set per candidate pair later.
    * The shared staging frame for every shingle-based operator — compute
    * once, persist, and derive candidates + verification from it (one
    * tokenization pass over the corpus instead of one per stage). */
  def shingleSets(df: DataFrame, textCol: String, idCol: String, k: Int = 3): DataFrame =
    withShingleHashes(df, textCol, k)
      .select(col(idCol).as("id"), sort_array(array_distinct(col("__sh"))).as("__set"))

  /** MinHash signature (length `numHashes`) over a pre-staged shingle-hash
    * array column — a native codegen'd expression (one primitive loop per
    * row); the higher-order-function formulation evaluated interpreted and
    * was ~50× slower (see graft.functions.NativeExpressions).
    */
  def minhashSignatureOver(shingleHashes: Column, numHashes: Int = 64): Column =
    graft.functions.NativeExpressions.minhashSignature(shingleHashes, numHashes)

  /** Convenience single-expression form (tests, small frames). For corpus
    * scale use the staged path inside `minhashLsh`. */
  def minhashSignature(text: Column, shingleK: Int = 3, numHashes: Int = 64): Column =
    minhashSignatureOver(TextAnalysis.wordShingles(text, shingleK), numHashes)

  /** Estimated Jaccard from two MinHash signatures — native agreement
    * kernel (the zip_with/aggregate HOF evaluated interpreted per pair). */
  def estJaccard(sigA: Column, sigB: Column): Column =
    graft.functions.NativeExpressions.arrayAgreement(sigA, sigB)

  /** D2: MinHash-LSH candidate pairs. Signatures are banded; rows sharing any
    * band hash meet in a bucket; each bucket emits its pairs. The only
    * shuffles are the band-key groupBy (bounded fan-out = rows × bands) and
    * the pair distinct. Returns (id_a, id_b, est_jaccard) with id_a < id_b,
    * est_jaccard ≥ `threshold`.
    */
  def minhashLsh(
      df: DataFrame, textCol: String, idCol: String,
      shingleK: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide evenly into bands")
    // persisted (Caches-owned): the banded self-join reads this from both
    // sides, and the signature computation is the expensive part of the
    // whole operator; the consumer releases it via Caches.releaseAll()
    val sigs = Caches.owned(withShingleHashes(df, textCol, shingleK)
      .select(col(idCol).as("id"), minhashSignatureOver(col("__sh"), numHashes).as("sig")))

    // The band join ships only (band, band_hash, id) — NOT the 64-long
    // signature (~16 KB/row×bands of shuffle it doesn't need). Pairs are
    // dedup'd on bare ids first; signatures re-join once per surviving pair.
    // Band hashing is the native BandHashes kernel (band-seeded FNV mix of
    // each slice): two rows collide iff their slice values are equal, same
    // as any hash — but ONE short generated loop instead of `bands`
    // unrolled xxhash64(element_at...) columns, which were a measurable
    // share of the operator's one-time janino compile cost.
    val banded = sigs.select(col("id"),
      posexplode(graft.functions.NativeExpressions.bandHashes(col("sig"), bands)))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "band_hash"))
      .select("band", "band_hash", "id")

    val a = banded.withColumnRenamed("id", "id_a")
    val b = banded.withColumnRenamed("id", "id_b")
    val pairs = a.join(b, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    pairs
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), estJaccard(col("sig_a"), col("sig_b")).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  /** D4: exact n-gram Jaccard verification on candidate pairs — join the
    * shingle sets back and compute |∩|/|∪| precisely. `pairs` must have
    * (id_a, id_b); only candidates pay this cost. `sets` is a pre-staged
    * `shingleSets` frame (arrays sorted ascending — required) so callers
    * share one tokenization pass. |∩| comes from the native sorted-merge
    * kernel and |∪| = |A| + |B| − |∩|: no per-pair array allocation (the
    * `array_intersect`/`array_union` formulation built two fresh arrays per
    * pair and dominated the verify join at ~1.4M candidates).
    */
  def jaccardVerifySets(pairs: DataFrame, sets: DataFrame): DataFrame =
    pairs
      .join(sets.withColumnsRenamed(Map("id" -> "id_a", "__set" -> "set_a")), Seq("id_a"))
      .join(sets.withColumnsRenamed(Map("id" -> "id_b", "__set" -> "set_b")), Seq("id_b"))
      .withColumn("__ov",
        graft.functions.NativeExpressions.sortedOverlapCount(col("set_a"), col("set_b")))
      .select(col("id_a"), col("id_b"),
        (col("__ov").cast("double") /
          (size(col("set_a")) + size(col("set_b")) - col("__ov"))).as("jaccard"))

  /** Convenience form that stages the sets itself (one extra tokenization —
    * prefer `jaccardVerifySets` when a sets frame already exists). */
  def jaccardVerify(pairs: DataFrame, df: DataFrame, textCol: String, idCol: String,
      shingleK: Int = 3): DataFrame =
    jaccardVerifySets(pairs, shingleSets(df, textCol, idCol, shingleK))

  /** D4 end-to-end: exact n-gram Jaccard near-dup pairs via PREFIX-FILTERED
    * inverted-index blocking (AllPairs/PPJoin): order every document's
    * shingles by global rarity (df asc) and index only the first
    * |s| − ⌈t·|s|⌉ + 1 of them. Any pair with J ≥ t shares ≥ ⌈t·max(|A|,|B|)⌉
    * shingles, so at least one falls inside BOTH prefixes under the shared
    * global order — every true pair is a candidate, while high-df
    * boilerplate shingles (which sort last) almost never enter a prefix and
    * so never build quadratic buckets. Only candidates pay the exact
    * |∩|/|∪| cost, and the final result is exactly {pairs: J ≥ t} —
    * independent of the blocking, hence oracle-checkable end to end (the
    * DuckDB side may even order ties differently; the guarantee holds for
    * any global order).
    *
    * Scale shape: one tokenization pass (sets persisted and reused for
    * candidate generation AND verification); shuffles on shingle (df),
    * id (prefix rank), shingle (pair join) — all at prefix volume, ~(1−t)
    * of the index; pair dedup on bare ids before the sets re-join.
    */
  def ngramJaccardDedup(df: DataFrame, textCol: String, idCol: String,
      shingleK: Int = 3, threshold: Double = 0.5): DataFrame =
    setJaccardPairs(shingleSets(df, textCol, idCol, shingleK), threshold)

  /** W26/D4-core: generic exact set-similarity join — the AllPairs/PPJoin
    * pass over ARBITRARY id sets, not just text shingles. This is the
    * entity-resolution primitive ("two KG entities sharing most claims",
    * "two suppliers shipping the same parts", "two users with the same
    * follows"): `setsIn` is (id, __set) with `__set` a SORTED-ascending
    * distinct `array<long>` (what [[shingleSets]] emits for text), and the
    * result is exactly {pairs: J ≥ threshold} — blocking-invisible, so any
    * engine can re-derive it. Same scale shape as D4: rarity-ordered
    * prefix index, length + positional filters before the pair-dedup
    * shuffle, native sorted-merge verification on candidates only. */
  def setJaccardPairs(setsIn: DataFrame, threshold: Double): DataFrame = {
    // pruning bounds are relaxed by Eps so floating-point roundoff can only
    // over-admit a candidate (verification is exact), never prune a true
    // J = threshold boundary pair — e.g. ceil(t/(1+t)·(sa+sb)) computed a
    // hair above its exact integer value would otherwise drop it
    val Eps = 1e-9
    val sets = Caches.owned(setsIn)
    val ex = sets.select(col("id"), explode(col("__set")).as("sh"), size(col("__set")).as("sz"))
    val dfreq = ex.groupBy("sh").agg(count(lit(1)).as("__df"))
    val ranked = ex.join(dfreq, Seq("sh"))
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("id")
          .orderBy(col("__df"), col("sh"))))
    val prefix = ranked
      .filter(col("__rn") <= col("sz") - ceil(lit(threshold) * col("sz") - lit(Eps)) + 1)
      .select("sh", "id", "sz", "__rn")
    // PPJoin-style pruning at candidate-generation time, BEFORE the pair
    // dedup shuffle (measured at sf0.1: 1.44M raw meeting rows → ~40k
    // candidate pairs). Both filters only reject pairs that provably cannot
    // reach J ≥ t:
    //  - length: J ≥ t ⇒ |∩| ≥ t·max(|A|,|B|) ⇒ min ≥ t·max;
    //  - positional: shared shingles at prefix positions (rn_a, rn_b) under
    //    the GLOBAL order bound the remaining overlap by
    //    1 + min(|A|−rn_a, |B|−rn_b); a true pair's first shared prefix
    //    shingle always satisfies it (all overlap sorts after that shingle
    //    in both documents), so at least one meeting row survives.
    val reqOverlap = ceil(lit(threshold / (1.0 + threshold)) * (col("sz_a") + col("sz_b")) - lit(Eps))
    val pa = prefix.select(col("sh"), col("id").as("id_a"), col("sz").as("sz_a"), col("__rn").as("rn_a"))
    val pb = prefix.select(col("sh"), col("id").as("id_b"), col("sz").as("sz_b"), col("__rn").as("rn_b"))
    val pairs = pa.join(pb, Seq("sh"))
      .filter(col("id_a") < col("id_b"))
      .filter(col("sz_a") >= lit(threshold) * col("sz_b") - lit(Eps) &&
        col("sz_b") >= lit(threshold) * col("sz_a") - lit(Eps))
      .filter(lit(1) + least(col("sz_a") - col("rn_a"), col("sz_b") - col("rn_b")) >= reqOverlap)
      .select("id_a", "id_b")
      .distinct()
    jaccardVerifySets(pairs, sets).filter(col("jaccard") >= threshold)
  }

  /** Plain inverted-index variant of `ngramJaccardDedup` — indexes EVERY
    * shingle and computes |∩| as a count aggregation over the full index.
    * A shingle shared by k documents contributes k² join rows, so this is
    * quadratic on boilerplate-heavy corpora — kept only as the differential
    * baseline the specs compare the prefix-filtered path against (both
    * return exactly {pairs: J ≥ t}). Do NOT use at corpus scale.
    */
  def ngramJaccardDedupBasic(df: DataFrame, textCol: String, idCol: String,
      shingleK: Int = 3, threshold: Double = 0.5): DataFrame = {
    val sets = Caches.owned(shingleSets(df, textCol, idCol, shingleK))
    val ex = sets.select(col("id"), explode(col("__set")).as("sh"))
    val inter = ex.withColumnRenamed("id", "id_a")
      .join(ex.withColumnRenamed("id", "id_b"), Seq("sh"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("__inter"))
    val sizes = sets.select(col("id"), size(col("__set")).as("__sz"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("__sz").as("__sz_a")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("__sz").as("__sz_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (col("__inter").cast("double") /
          (col("__sz_a") + col("__sz_b") - col("__inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** D7: decontamination — train-set documents sharing ANY k-word shingle
    * with the eval set (the train/test-overlap scrub every LLM pipeline runs
    * before training). Returns the contaminated train ids (one column `id`).
    *
    * Scale shape: the eval side collapses to a DISTINCT shingle-hash set —
    * tiny next to the train corpus (eval sets are thousands of docs, train
    * is billions), so Catalyst broadcasts it and the semi-join never
    * shuffles the train side; ids ship, never text. Real pipelines use
    * large k (8-13 words): long shingles make incidental overlap vanishingly
    * rare, which also keeps the broadcast set small. Small k on tiny test
    * corpora exercises the same plan.
    */
  /** D9: NEAR-duplicate decontamination — train docs whose exact shingle
    * Jaccard with ANY eval doc reaches `threshold`. D7/D8 scrub exact
    * shingle overlap; this catches the paraphrase/near-copy leakage those
    * miss (an eval answer lightly reworded in a web page). Ids must be
    * disjoint across the two sets (offset the eval side).
    *
    * Built on the LOSSLESS prefix-filtered exact-Jaccard pass (D4's
    * PPJoin), not LSH banding: banding is probabilistic — a true J ≥ t
    * pair can miss every band, and a decontamination that silently keeps a
    * contaminated doc with some probability is not a gateable (or
    * shippable) scrub. The prefix filter admits every true pair by
    * construction, so the result is exactly {train id : ∃ eval doc,
    * J ≥ t} — blocking-independent, hence oracle-checkable. One shared
    * near-dup pass over train ∪ eval powers D4 pairs, D6 clusters AND this
    * flag set in a real pipeline; the train×train pairs it also emits are
    * not overhead there, they are the dedup output. */
  def decontaminateNear(train: DataFrame, eval: DataFrame,
      textCol: String, idCol: String, shingleK: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    val unioned = train.select(col(idCol), col(textCol))
      .unionByName(eval.select(col(idCol), col(textCol)))
    val pairs = ngramJaccardDedup(unioned, textCol, idCol, shingleK, threshold)
    val evalIds = eval.select(col(idCol).as("other"))
    // The disjoint-ids contract is enforced in-plan, not just documented:
    // an id in BOTH sets would silently merge the two docs' shingle sets
    // through the unionByName above and corrupt the pair graph. The guard
    // is a column-pruned id semi-join (eval side broadcast-sized) unioned
    // into the result as an empty-unless-violated raise_error branch — it
    // fires during the same action, costing no extra pass.
    val idType = train.select(col(idCol)).schema.head.dataType
    val clash = train.select(col(idCol).as("id"))
      .join(eval.select(col(idCol).as("id")), Seq("id"), "left_semi")
      .select(raise_error(concat(
        lit("decontaminateNear: train/eval ids must be disjoint; shared id "),
        col("id").cast("string"))).cast(idType).as("id"))
    pairs.select(col("id_a").as("id"), col("id_b").as("other"))
      .unionByName(pairs.select(col("id_b").as("id"), col("id_a").as("other")))
      .join(evalIds, Seq("other"), "left_semi")
      .select("id").distinct()
      .join(train.select(col(idCol).as("id")), Seq("id"), "left_semi")
      .unionByName(clash)
  }

  def decontaminate(train: DataFrame, eval: DataFrame,
      textCol: String, idCol: String, shingleK: Int = 8): DataFrame = {
    val t = withShingleHashes(train, textCol, shingleK)
      .select(col(idCol).as("id"), explode(array_distinct(col("__sh"))).as("sh"))
    val e = withShingleHashes(eval, textCol, shingleK)
      .select(explode(array_distinct(col("__sh"))).as("sh"))
      .distinct()
    t.join(broadcast(e), Seq("sh"), "left_semi")
      .select("id")
      .distinct()
  }

  /** D8: Bloom-filter decontamination — D7's sketch path. D7 broadcasts the
    * exact DISTINCT eval shingle-hash set, whose size is unbounded as the
    * eval side grows (many benchmarks × thousands of shingles each). A Bloom
    * filter caps the shipped bits at a FIXED size chosen by (expectedItems,
    * fpp) regardless of the true set size, and errs only toward
    * over-scrubbing: false positives drop extra train docs — the safe
    * direction for decontamination — while false negatives are impossible.
    *
    * Spark-first shape: the filter is built by Spark's own mergeable
    * `BloomFilterAggregate` (map-side partial merges, one pass over the eval
    * side, no driver-side item loop), lands on the driver as a single binary
    * scalar (the one collect — same class of driver scalar as IVF's
    * centroids), and re-enters the plan as a Literal inside
    * `BloomFilterMightContain` — the identical codegen'd predicate Spark's
    * runtime join-pruning injects — so the train side is filtered inside
    * whole-stage codegen, never shuffles, and ships ids only.
    */
  def decontaminateBloom(train: DataFrame, eval: DataFrame,
      textCol: String, idCol: String, shingleK: Int = 8,
      expectedItems: Long = 4L << 20, fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    val numBits = org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits(expectedItems, fpp)
    val evalSh = withShingleHashes(eval, textCol, shingleK)
      .select(explode(col("__sh")).as("sh"))
    val agg = new BloomFilterAggregate(expression(col("sh")),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    val bf = evalSh.select(column(agg).as("bf")).head().getAs[Array[Byte]]("bf")
    val trainSh = withShingleHashes(train, textCol, shingleK)
      .select(col(idCol).as("id"), explode(array_distinct(col("__sh"))).as("sh"))
    trainSh
      .filter(column(BloomFilterMightContain(
        Literal(bf, org.apache.spark.sql.types.BinaryType), expression(col("sh")))))
      .select("id")
      .distinct()
  }

  /** SimHash: 64-bit signature — token hashes vote ±1 per bit, sign of each
    * bit-sum becomes the bit. Near-dups have small hamming distance.
    * Token hashing via the native shingle kernel (k=1): the
    * `transform(..., t -> xxhash64(t))` HOF evaluated interpreted. */
  def simhash(text: Column): Column =
    graft.functions.NativeExpressions.simhash64(
      graft.functions.NativeExpressions.wordShingleHashes(
        split(lower(trim(text)), "\\s+"), 1))

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** D3: SimHash near-dup pairs within `maxHamming`. Multi-index blocking:
    * the 64-bit signature is cut into `maxHamming + 2` blocks and candidates
    * must agree on a PAIR of blocks — ≤ maxHamming differing bits dirty at
    * most maxHamming blocks, leaving ≥ 2 clean ones, so every true pair
    * shares some clean block-pair key. Squaring the key space keeps buckets
    * sparse when block width is small (maxHamming=7: 14-bit pair keys vs
    * 8-bit single-block keys — ~14× fewer candidate pairs measured), and the
    * exact hamming filter keeps precision exact either way.
    */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String, maxHamming: Int = 3): DataFrame = {
    val blocks = maxHamming + 2
    val width  = 64 / blocks
    val sigs = Caches.owned(
      df.select(col(idCol).as("id"), simhash(col(textCol)).as("sig")))
    def blockVal(b: Int): Column =
      shiftright(col("sig"), b * width).bitwiseAND(lit((1L << width) - 1))
    val pairKeys = for {
      b1 <- 0 until blocks
      b2 <- (b1 + 1) until blocks
    } yield struct(lit(b1 * blocks + b2).as("pk"),
      (blockVal(b1) * (1L << width) + blockVal(b2)).as("pv"))
    // unlike the MinHash band join (64-long signature arrays), the simhash
    // signature is ONE long — carrying it through the pair-key explode is 8
    // bytes/row, cheaper than a dedup + two re-joins would be
    val blocked = sigs.select(col("id"), col("sig"), explode(array(pairKeys: _*)).as("t"))
      .select(col("id"), col("sig"), col("t.pk").as("block"), col("t.pv").as("block_val"))
    val a = blocked.select(col("block"), col("block_val"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = blocked.select(col("block"), col("block_val"), col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("block", "block_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), hamming(col("sig_a"), col("sig_b")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** D14: SOFT dedup — keep every row, down-weight duplicates. The
    * data-constrained-scaling result (Muennighoff et al. 2023,
    * arXiv:2305.16264): when data is the bottleneck, repeating documents
    * at reduced weight beats dropping them; samplers consume a per-row
    * weight instead of a survivor set. Weight = 1000 div |copy group| in
    * exact per-mille integers (the T18/P10 discipline — no float division
    * in the hash path), so each content group carries total weight ~1
    * regardless of how often it was crawled.
    *
    * Scale: same shape as D1 — one shuffle on the 128-bit content hash
    * for the group sizes (map-side partial count), one hash-keyed join
    * back; ids and counts only, text never re-shuffles. For FUZZY groups,
    * feed [[keepBestPerCluster]]'s component frame through a groupBy on
    * `component` instead — the weighting arithmetic is identical. */
  def softDedupWeights(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val hashed = df.select(col(idCol), md5(col(textCol)).as("__h"))
    val sizes = hashed.groupBy("__h").agg(count(lit(1)).as("n_copies"))
    hashed.join(sizes, Seq("__h"))
      .select(col(idCol), col("n_copies"),
        expr("1000 div n_copies").as("weight_pm"))
  }

  /** D13: fuzzy dedup that keeps the BEST member of each near-dup cluster
    * instead of the smallest id. Production pipelines pair this with a
    * quality score (T2/T18/T21): when a boilerplate-laden mirror and the
    * clean original land in one cluster, min-id keeps whichever crawled
    * first; keep-best keeps the one worth training on.
    *
    * `pairs` is any near-dup pair frame (D2/D3/D4 output — (id_a, id_b));
    * `score` is evaluated against `docs`' columns. Winner per component =
    * argmax(score), ties broken by MIN id, so the result is deterministic
    * and independent of blocking/iteration order whenever scores are.
    *
    * Scale: components come from the large-star/small-star CC (O(log n)
    * rounds, id-only shuffles); the winner election is one map-side-partial
    * `max_by` agg on the component key — (component, score, id) triples,
    * never text, cross the wire, and a giant cluster costs its winner agg
    * O(members) combined per-partition, not a window sort. Returns
    * (id, component, kept_id, is_kept) for every input doc. */
  def keepBestPerCluster(docs: DataFrame, idCol: String, pairs: DataFrame,
      score: Column, reliable: Boolean = false): DataFrame = {
    val scored = docs.select(col(idCol).as("id"), score.as("__score"))
    // Caches-owned: the labeled frame feeds BOTH the winner election and
    // the final join — unpinned, the label+score join tree (and through
    // it the caller's pair derivation if it wasn't materialized) would
    // evaluate twice
    val labeled = Caches.owned(ConnectedComponents
      .labels(docs.select(col(idCol)), pairs, reliable = reliable)
      .join(scored, Seq("id")))
    val winners = labeled.groupBy("component")
      // lexicographic struct max: highest score first, then -id (= min id)
      .agg(max_by(col("id"), struct(col("__score"), (-col("id")).as("__nid")))
        .as("kept_id"))
    labeled.join(winners, Seq("component"))
      .select(col("id"), col("component"), col("kept_id"),
        (col("id") === col("kept_id")).as("is_kept"))
  }
}
