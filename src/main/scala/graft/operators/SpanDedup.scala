package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Positional deduplication — duplicate removal below document grain
  * (SURVEY.md §2.3 D11/D12). D1-D10 decide whole documents; web-scale
  * corpora also need the finer cuts every production crawl pipeline runs:
  *
  *  - D11 [[lineDedup]]: cross-document line dedup — each distinct line
  *    keeps ONE occurrence corpus-wide (CCNet's shard-hash paragraph dedup;
  *    distinct from T13's `stripBoilerplate`, which drops corpus-FREQUENT
  *    lines from every doc: T13 is a frequency filter, D11 a keep-first
  *    global dedup — a line appearing twice anywhere loses its second copy).
  *  - D12 [[substringDedup]]: exact duplicated-span removal — any token
  *    window of length >= `minTokens` occurring more than once (across OR
  *    within documents) survives only at its first occurrence; overlapping
  *    and adjacent duplicated windows merge into maximal spans first
  *    (Lee et al., "Deduplicating Training Data Makes Language Models
  *    Better" — the ExactSubstr operator, re-expressed as a window-hash
  *    group instead of a monolithic suffix array: every duplicated
  *    substring of length >= L is exactly the union of its duplicated
  *    L-windows, so marking window occurrences that are not their hash
  *    group's minimum and merging covers precisely the same spans).
  *
  * Scale shape (both operators): the duplicate decision travels as an id
  * skeleton — (hash, doc, position) triples, computed once and
  * Caches-owned where consumed twice — through one groupBy on the content
  * hash and one join back on it, never carrying text. Text never rides a
  * shuffle except the final rebuild join on the doc id (the output
  * materialization, where the rebuild re-derives lines/tokens from the
  * raw text inside its own scan); with the corpus bucketed by id (R17)
  * even that join is co-located. Per-document reassembly is
  * higher-order-function work inside the row — no posexplode of text, no
  * window sort over the corpus. Hash grouping stands in for string
  * grouping by the D4/D7 collision argument (64-bit content hashes; equal
  * hash ⟺ equal content up to ~2^-64 per candidate pair).
  */
object SpanDedup {

  /** D11: corpus-wide keep-first line dedup. Lines are `\n`-split and
    * space-trimmed; blank lines are dropped as normalization. For each
    * distinct trimmed line, the occurrence with the smallest
    * (doc, line_no) — document order, then position — survives; every
    * other occurrence (later docs AND later repeats inside the same doc)
    * is removed. Returns one row per input doc:
    * (idCol, textCol = surviving lines re-joined with `\n`,
    *  n_lines_kept, n_lines_dropped).
    */
  def lineDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val docs = df.select(col(idCol).as("__id"), col(textCol).as("__text"))
    // id skeleton: (line-hash, doc, line_no) for non-blank lines — text
    // stays behind in the scan
    val skel = docs
      .select(col("__id"), posexplode(split(col("__text"), "\n")).as(Seq("__ln", "__l")))
      .filter(trim(col("__l")) =!= "")
      .select(xxhash64(trim(col("__l"))).as("__h"), col("__id"), col("__ln"))
    // one shuffle on the content hash: min (doc, line_no) per distinct line
    val winners = skel.groupBy("__h")
      .agg(min(struct(col("__id"), col("__ln"))).as("__w"))
      .select(col("__w.__id").as("__id"), col("__w.__ln").as("__ln"))
    // a doc's surviving lines are exactly its winning occurrences —
    // collapse to one small (doc, positions[]) row per affected doc
    val keptPerDoc = winners.groupBy("__id")
      .agg(sort_array(collect_list(col("__ln"))).as("__keep"))
    // rebuild inside the row: positions are filtered against the kept list,
    // the doc's own split supplies the text (never shuffled until here)
    docs.join(keptPerDoc, Seq("__id"), "left")
      .select(col("__id"), col("__text"),
        coalesce(col("__keep"), expr("array()").cast("array<int>")).as("__keep"))
      .withColumn("__arr", split(col("__text"), "\n"))
      .select(
        col("__id").as(idCol),
        array_join(
          transform(
            filter(sequence(lit(0), size(col("__arr")) - 1),
              i => array_contains(col("__keep"), i)),
            i => trim(element_at(col("__arr"), i + 1))),
          "\n").as(textCol),
        size(col("__keep")).cast("long").as("n_lines_kept"),
        (size(filter(col("__arr"), l => trim(l) =!= "")) - size(col("__keep")))
          .cast("long").as("n_lines_dropped"))
  }

  /** D12 detection half: maximal duplicated token spans per doc, as
    * (idCol, span_start, span_end) with token positions 0-based and `end`
    * exclusive. A window occurrence is REDUNDANT iff it is not its hash
    * group's minimum (doc, pos); redundant windows overlapping or exactly
    * adjacent (next.start <= prev.start + minTokens) merge into one span.
    * First occurrences are never part of a span — each duplicated
    * substring keeps one copy corpus-wide. Tokenization is the shared
    * `Search.toks` contract (lower, trim, split `\s+`); docs shorter than
    * `minTokens` tokens cannot contain a qualifying span and emit nothing.
    */
  def duplicateSpans(df: DataFrame, textCol: String, idCol: String,
      minTokens: Int): DataFrame = {
    require(minTokens >= 2, s"minTokens must be >= 2, got $minTokens")
    val toks = df.select(col(idCol).as("__id"), Search.toks(col(textCol)).as("__t"))
      .filter(size(col("__t")) >= minTokens)
    // (hash, doc, pos) skeleton — the kernel emits one order-sensitive
    // 64-bit hash per L-window in a single primitive pass per row.
    // Caches-owned: the skeleton feeds BOTH the first-occurrence groupBy
    // and the join back; without it each consumer re-tokenizes the corpus
    // (released by the caller via Caches.releaseAll — the lshTopK
    // discipline; ~20 bytes per token window, far smaller than the text)
    val occ = Caches.owned(toks.select(col("__id"),
      posexplode(graft.functions.NativeExpressions.wordShingleHashes(
        col("__t"), minTokens)).as(Seq("__p", "__h"))))
    // duplicated windows and their first occurrence, one shuffle on __h
    val firsts = occ.groupBy("__h")
      .agg(min(struct(col("__id"), col("__p"))).as("__w"), count(lit(1)).as("__c"))
      .filter(col("__c") >= 2)
      .select(col("__h"), col("__w.__id").as("__wid"), col("__w.__p").as("__wp"))
    val redundant = occ.join(firsts, Seq("__h"))
      .filter(!(col("__id") === col("__wid") && col("__p") === col("__wp")))
      .select(col("__id"), col("__p"))
    // gaps-and-islands per doc: window length is constant, so positions
    // sorted ascending merge iff pos <= prev_pos + L; the window partition
    // is per-doc redundant windows only — corpus-bounded, never a global
    // sort
    val w = Window.partitionBy("__id").orderBy("__p")
    val gap = when(col("__p") > lag(col("__p"), 1).over(w) + minTokens, 1)
      .otherwise(0)
    redundant
      .withColumn("__isl", sum(gap).over(w))
      .groupBy(col("__id"), col("__isl"))
      .agg(min("__p").as("span_start"), (max("__p") + minTokens).as("span_end"))
      .select(col("__id").as(idCol),
        col("span_start").cast("long"), col("span_end").cast("long"))
  }

  /** D12: exact duplicated-span removal. Every token inside a
    * [[duplicateSpans]] span is dropped; first occurrences survive, so the
    * cleaned corpus still carries each duplicated substring exactly once.
    * Returns one row per input doc — (idCol, n_spans, n_removed_tokens,
    * clean_text) — where clean_text is the surviving tokens of the
    * `Search.toks` stream re-joined with single spaces (the operator works
    * on the normalized token stream, as ExactSubstr does on the tokenized
    * corpus; reconstruction of original whitespace is deliberately out of
    * scope). */
  def substringDedup(df: DataFrame, textCol: String, idCol: String,
      minTokens: Int): DataFrame = {
    val spans = duplicateSpans(df, textCol, idCol, minTokens)
    val perDoc = spans.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("span_end") - col("span_start")).as("n_removed_tokens"),
        sort_array(collect_list(struct(col("span_start"), col("span_end"))))
          .as("__spans"))
    df.select(col(idCol), Search.toks(col(textCol)).as("__t"))
      .join(perDoc, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_removed_tokens"), lit(0L)).as("n_removed_tokens"),
        array_join(
          transform(
            when(col("n_spans").isNull, sequence(lit(0), size(col("__t")) - 1))
              .otherwise(filter(sequence(lit(0), size(col("__t")) - 1),
                i => !exists(col("__spans"),
                  sp => i >= sp("span_start") && i < sp("span_end")))),
            i => element_at(col("__t"), i + 1)),
          " ").as("clean_text"))
  }
}
