package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** D16: bounded edit-distance similarity join — all pairs with Levenshtein
  * distance ≤ 1 over a short-string column (labels, titles, names, aliases;
  * the typo-tolerance primitive the D2-D5 token/vector family cannot
  * express, because one character edit barely moves a shingle set or an
  * embedding but IS the whole difference between two catalog labels).
  *
  * Candidate generation is the FastSS deletion neighborhood (Bocek et al.
  * 2007): each string emits itself plus its |s| single-character deletions;
  * two strings within edit distance 1 PROVABLY share a variant —
  * equal → the string itself, substitution at p → both p-deletions,
  * insertion/deletion → the longer side's deletion equals the shorter
  * string — so a hash-bucket self-join over variants is a COMPLETE
  * candidate set, and sharing any variant bounds the distance by 2, so the
  * exact verify only trims. Verification is Spark's codegen'd
  * `levenshtein` on the candidate pairs.
  *
  * Scale shape: ~(len+1) variant rows per string, each shuffling as an
  * 8-byte `xxhash64(variant)` plus the id — ids, not strings, cross the
  * wire (the §5 rule); strings re-join per surviving pair for the verify.
  * No cross join anywhere: cost is Σ bucket², the D2/D4 banding argument
  * with deletion variants as the bands. The (len+1) blow-up prices the
  * operator for SHORT strings — exactly its use case; document-scale text
  * belongs to D2-D4.
  */
object EditJoin {

  /** The FastSS k=1 variant set of `s`: element 0 is `s`, element i ≥ 1 is
    * `s` with character i removed. */
  private def variants(s: Column): Column =
    transform(sequence(lit(0), length(s)), i =>
      when(i === 0, s)
        .otherwise(concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s)))))

  /** Variant-hash index over a label frame: (idCol, `__h`) rows, distinct —
    * the write-once side of [[fuzzyLookup]]. Persist it sorted/bucketed on
    * `__h` and a fuzzy point lookup becomes |term|+1 pushed-down hash-key
    * probes instead of any scan of the labels. */
  def variantIndex(df: DataFrame, idCol: String, strCol: String): DataFrame =
    df.select(col(idCol), explode(variants(col(strCol))).as("__v"))
      .select(col(idCol), xxhash64(col("__v")).as("__h"))
      .distinct()

  /** The term's |term|+1 deletion-variant hashes, computed driver-side
    * with the catalyst `XxHash64` at the same seed the index stores. */
  def termVariantHashes(term: String): Seq[Long] = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    (term +: (0 until term.length).map(i =>
      term.substring(0, i) + term.substring(i + 1))).distinct
      .map(v =>
        XxHash64(Seq(Literal(org.apache.spark.unsafe.types.UTF8String.fromString(v),
          org.apache.spark.sql.types.StringType)), 42L).eval(null).asInstanceOf[Long])
  }

  private def lookupTail(probed: DataFrame, labels: DataFrame, idCol: String,
      strCol: String, term: String): DataFrame =
    probed.select(idCol).distinct()
      .join(labels, Seq(idCol))
      .withColumn("dist", levenshtein(col(strCol), lit(term)))
      .filter(col("dist") <= 1)

  /** W32: typo-tolerant point lookup — rows of `labels` whose `strCol` is
    * within Levenshtein distance 1 of `term`. The TERM's deletion-variant
    * hashes form an `IN` filter on the index — a candidate probe that
    * reads hash keys, not labels — then the exact verify runs on the
    * candidates only. Output: label row + `dist`. */
  def fuzzyLookup(index: DataFrame, labels: DataFrame, idCol: String,
      strCol: String, term: String): DataFrame =
    lookupTail(index.filter(col("__h").isin(termVariantHashes(term): _*)),
      labels, idCol, strCol, term)

  /** W33: persist the variant index as a RANGE-CLUSTERED snapshot table —
    * each data file covers a narrow `__h` range, its footer (min, max)
    * lands in the R42 stats sidecar at commit time, and a fuzzy lookup's
    * `IN` probe plans only the files whose range contains a term-variant
    * hash: at most |term|+1 point reads whatever the corpus size, the
    * labels themselves never scanned. Rebuild on label churn is one
    * commit; readers keep snapshot isolation throughout (R40). */
  def saveIndex(spark: org.apache.spark.sql.SparkSession, table: String,
      labels: DataFrame, idCol: String, strCol: String,
      files: Int = 64): Long =
    SnapshotTable.commit(spark, table,
      variantIndex(labels, idCol, strCol)
        .repartitionByRange(files, col("__h"))
        .sortWithinPartitions("__h"))

  /** W33: [[fuzzyLookup]] against a [[saveIndex]] store — the probe goes
    * through [[SnapshotTable.readPruned]], so R42 footer stats confine the
    * scan to the files the term hashes can live in. */
  def fuzzyLookupStored(spark: org.apache.spark.sql.SparkSession,
      table: String, labels: DataFrame, idCol: String, strCol: String,
      term: String): DataFrame =
    lookupTail(
      SnapshotTable.readPruned(spark, table,
        col("__h").isin(termVariantHashes(term): _*)),
      labels, idCol, strCol, term)

  /** W36: incremental maintenance of a [[saveIndex]] store under label
    * churn — ONE Append commit of the new/updated labels' variant rows, no
    * rebuild, no touch of the existing files.
    *
    * Why appends alone keep every lookup EXACT: candidate completeness
    * needs the variants of every CURRENT label present — the delta provides
    * exactly the new/updated ones, and unchanged labels' rows are already
    * there. Precision needs no deletion at all, because [[fuzzyLookup]]'s
    * tail re-verifies every candidate with exact `levenshtein` against the
    * CURRENT labels frame: a stale variant row of a renamed id either
    * verifies against the NEW label (fine) or fails the distance bound and
    * drops; a deleted id vanishes at the inner join to current labels.
    * Stale rows cost false candidates only — bounded by the churn since
    * the last fold, never wrong answers.
    *
    * At 100 TB this is the only shape that works: per-changeset cost is
    * priced by the DELTA (labels × (len+1) hash rows), while a rebuild
    * would re-shuffle the whole corpus per crawl. Appends dilute the range
    * clustering (each delta spans the full `__h` range), so probes touch
    * up to |term|+1 files PER COMMIT — fold with [[saveIndex]] (one
    * Replace-semantics Overwrite commit, snapshot-isolated from concurrent
    * readers) when the commit count, not the corpus, says so. */
  def appendIndexDelta(spark: org.apache.spark.sql.SparkSession, table: String,
      changedLabels: DataFrame, idCol: String, strCol: String,
      files: Int = 4, tag: Option[String] = None): Long =
    SnapshotTable.commit(spark, table,
      variantIndex(changedLabels, idCol, strCol)
        .repartitionByRange(files, col("__h"))
        .sortWithinPartitions("__h"),
      SnapshotTable.Append, tag = tag)

  /** All (a_id, b_id, dist) with `levenshtein(a, b) <= 1` and a_id < b_id.
    * Complete and exact (see class doc). */
  def pairsWithinEd1(df: DataFrame, idCol: String, strCol: String): DataFrame =
    pairsWithin(df, idCol, strCol, k = 1)

  /** All (a_id, b_id, dist) with `levenshtein(a, b) <= k`, a_id < b_id,
    * for k ∈ {1, 2}. The k=2 neighborhood is one more deletion pass over
    * the k=1 variants (D≤2 = D≤1 ∘ D≤1); the completeness argument
    * composes — an optimal ≤2-op edit script costs at most one deletion
    * per op on each side, so both sides reach a common ≤2-deletion
    * variant — and sharing one bounds the distance by 2k, which the exact
    * verify trims. Variant count grows to ~|s|²/2 per string at k=2:
    * still label-priced, still never a cross join. */
  def pairsWithin(df: DataFrame, idCol: String, strCol: String,
      k: Int): DataFrame = {
    require(k == 1 || k == 2, s"pairsWithin supports k in {1, 2}, got $k")
    val s = col("__s")
    val vs = if (k == 1) variants(s)
      else array_distinct(flatten(transform(variants(s), v => variants(v))))
    val v = df.select(col(idCol).as("__id"), col(strCol).as("__s"))
      .select(col("__id"), explode(vs).as("__v"))
      .select(col("__id"), xxhash64(col("__v")).as("__h"))
      .distinct()
    val cand = v.as("a").join(v.as("b"),
        col("a.__h") === col("b.__h") && col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("a_id"), col("b.__id").as("b_id"))
      .distinct()
    val sa = df.select(col(idCol).as("a_id"), col(strCol).as("__sa"))
    val sb = df.select(col(idCol).as("b_id"), col(strCol).as("__sb"))
    cand.join(sa, Seq("a_id")).join(sb, Seq("b_id"))
      .withColumn("dist", levenshtein(col("__sa"), col("__sb")))
      .filter(col("dist") <= k)
      .select(col("a_id"), col("b_id"), col("dist"))
  }
}
