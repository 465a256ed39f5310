package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** T29: in-engine BPE tokenizer TRAINING — the step every LLM data pipeline
  * runs before T16 can tokenize anything, over the corpus the pipeline just
  * curated. The reference's row store has no analogue; tools/train_bpe.py
  * (the offline generator of the shipped merge table) states the law this
  * operator re-expresses Spark-first:
  *
  *   - pretokens: `[a-z]+|[0-9]+|[^a-z0-9\s]` over lowercased text, counted
  *     corpus-wide (the t16 tokenizer's own pre-tokenization);
  *   - greedy merges: per step, the adjacent token pair with the highest
  *     corpus-weighted count; ties go to the lexicographically GREATEST
  *     pair — fully deterministic, so two engines can hash-compare tables;
  *   - merge application is the non-overlapping left-to-right pass.
  *
  * Scale shape — the part worth getting right at 100 TB: the CORPUS-sized
  * work is exactly one scan (pretoken explode + groupBy word, map-side
  * partial aggregation), because BPE training only ever consumes the
  * word-frequency profile, never the corpus again. That profile is
  * vocabulary-sized (it grows ~log with corpus bytes), and [[wordCounts]]
  * caps it at `maxVocab` rows by (count, word) — the standard trainer move
  * (HuggingFace/sentencepiece min-count/cap the vocab the same way): the
  * singleton tail a web corpus carries cannot influence early merges. The
  * greedy loop then runs driver-side over that bounded profile with
  * INCREMENTAL pair-count maintenance (each merge touches only the words
  * containing the merged pair — the naive full rescan per step is
  * quadratic and was the python tool's original sin too).
  *
  * Gate `t29_bpe_train` hash-compares the first merges against a DuckDB
  * re-derivation that UNROLLS the training steps in SQL (pair-count argmax
  * + a list_reduce merge fold per step) — a true cross-engine differential
  * of the training law itself; BpeTrainSpec pins incremental ≡ naive
  * rescan, prefix stability, and that [[train]] over the shipped table's
  * own sources reproduces the python-trained
  * src/main/resources/graft/bpe_merges.txt prefix exactly.
  */
object BpeTrain {

  /** The t16 pre-tokenization law (shared with tools/train_bpe.py and the
    * t16/t29 DuckDB oracles). */
  val pretokenRegex: String = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  /** Distributed word-frequency profile: ONE corpus scan per text column,
    * unioned, then a word groupBy (map-side combine). `maxVocab` bounds the
    * driver-side profile deterministically — top-N by (count desc, word
    * desc), so a capped run is reproducible too. */
  def wordCounts(df: DataFrame, textCols: Seq[String],
      maxVocab: Int = 1 << 20): Seq[(String, Long)] = {
    // typed function, NOT expr(): a SQL string literal would eat the \s
    // escape and the pattern would silently capture spaces as pretokens
    val scans = textCols.map(c =>
      df.select(explode(
        regexp_extract_all(lower(col(c)), lit(pretokenRegex), lit(0))).as("w")))
    scans.reduce(_ unionAll _)
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").desc)
      .limit(maxVocab)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
  }

  /** Unicode-codepoint split — DuckDB's `w[i]` character indexing and
    * python's string iteration both walk codepoints, so the Scala side
    * must too (a surrogate-pair split would silently diverge). */
  private def codepoints(w: String): Vector[String] = {
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      b += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    b.result()
  }

  private def pairsOf(toks: Vector[String]): Map[(String, String), Long] =
    if (toks.length < 2) Map.empty
    else toks.zip(toks.tail).groupBy(identity).view.mapValues(_.size.toLong).toMap

  /** The greedy loop over a collected (word, count) profile — incremental
    * pair-count maintenance, deterministic tie law (count desc, then
    * lexicographically greatest pair). Returns at most `nMerges` merges
    * (fewer when the vocabulary fully merges first). */
  def trainFromCounts(vocab: Seq[(String, Long)], nMerges: Int): Seq[(String, String)] = {
    import scala.collection.mutable
    val freq = vocab.toMap
    val words = mutable.Map(vocab.map { case (w, _) => w -> codepoints(w) }: _*)
    val pairCounts = mutable.Map.empty[(String, String), Long]
    val pairWords = mutable.Map.empty[(String, String), mutable.Set[String]]
    for ((w, toks) <- words; (p, c) <- pairsOf(toks)) {
      pairCounts(p) = pairCounts.getOrElse(p, 0L) + c * freq(w)
      pairWords.getOrElseUpdate(p, mutable.Set.empty) += w
    }
    val merges = mutable.Buffer.empty[(String, String)]
    var exhausted = false
    while (merges.size < nMerges && !exhausted) {
      val live = pairCounts.iterator.filter(_._2 > 0)
      if (live.isEmpty) exhausted = true
      else {
        val ((a, b), _) = live.maxBy { case ((x, y), c) => (c, x, y) }
        merges += ((a, b))
        for (w <- pairWords.getOrElse((a, b), mutable.Set.empty).toSeq) {
          val toks = words(w)
          val old = pairsOf(toks)
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < toks.length) {
            if (i < toks.length - 1 && toks(i) == a && toks(i + 1) == b) {
              out += a + b; i += 2
            } else { out += toks(i); i += 1 }
          }
          val nw = out.result()
          words(w) = nw
          val neu = pairsOf(nw)
          for (p <- old.keySet ++ neu.keySet) {
            val d = neu.getOrElse(p, 0L) - old.getOrElse(p, 0L)
            if (d != 0L)
              pairCounts(p) = pairCounts.getOrElse(p, 0L) + d * freq(w)
            if (neu.getOrElse(p, 0L) > 0L)
              pairWords.getOrElseUpdate(p, mutable.Set.empty) += w
            else pairWords.get(p).foreach(_ -= w)
          }
        }
      }
    }
    merges.toSeq
  }

  /** End-to-end: corpus columns → merge table. */
  def train(df: DataFrame, textCols: Seq[String], nMerges: Int,
      maxVocab: Int = 1 << 20): Seq[(String, String)] =
    trainFromCounts(wordCounts(df, textCols, maxVocab), nMerges)

  /** T30: the PUBLISHABLE vocabulary of a trained table — what a model
    * config actually consumes: (token_id, token, kind) with the GPT-2
    * construction, base tokens first (the training vocabulary's distinct
    * codepoints in lexicographic order), then one token per merge in
    * merge order. Ids are dense ranks of that deterministic order, so two
    * engines — and two runs — assign identical ids; T29's determinism
    * extends to the id space. */
  def vocabulary(wordCounts: Seq[(String, Long)],
      merges: Seq[(String, String)]): Seq[(Long, String, String)] = {
    val base = wordCounts.iterator
      .flatMap { case (w, _) => codepoints(w) }
      .toSeq.distinct.sorted
    base.zipWithIndex.map { case (t, i) => (i.toLong, t, "base") } ++
      merges.zipWithIndex.map { case ((a, b), i) =>
        ((base.size + i).toLong, a + b, "merge") }
  }
}
