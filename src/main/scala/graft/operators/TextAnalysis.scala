package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation (SURVEY.md §2.3 T1-T4).
  * All pure column expressions — token counting, quality scoring, language ID
  * and fingerprinting run inside WholeStageCodegen with no UDF boundary, so
  * they cost one codegen'd pass over the corpus at any scale.
  */
object TextAnalysis {

  /** T26: canonical text normalization — the cleanup pass every corpus gets
    * BEFORE hashing, dedup or tokenization, because all three key on exact
    * byte sequences: `é` typed as `e`+U+0301 vs precomposed U+00E9, a CRLF vs
    * LF newline, or an invisible zero-width space otherwise make canonically
    * identical documents hash apart (silent dedup misses) and split tokens.
    * The pipeline, in order — each step a documented contract, replayed
    * verbatim by the DuckDB oracle:
    *
    *   1. Unicode NFC (native [[graft.functions.NfcNormalize]] — codegen'd,
    *      ASCII fast path, Spark has no built-in);
    *   2. newlines to `\n` (CRLF and lone CR);
    *   3. strip invisibles: ZWSP/ZWNJ/ZWJ U+200B-U+200D, BOM U+FEFF, soft
    *      hyphen U+00AD;
    *   4. strip control chars except tab/newline;
    *   5. collapse space/tab runs to one space;
    *   6. trim spaces around newlines;
    *   7. collapse 3+ blank-line runs to one blank line; trim the ends.
    *
    * Everything after step 1 is built-in `regexp_replace` (codegen'd; the
    * patterns stay inside the RE2∩Java subset, the T8 discipline, so the
    * oracle runs the identical regexes). One projection pass, no shuffle,
    * no UDF — at 100 TB this is a map-only scan that fuses into whatever
    * consumes it. */
  def normalizeText(text: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.NativeExpressions.normalizeTextExpr(
      ColumnBridge.expression(text)))
  }

  // ---- T27: multilingual normalization profiles ----------------------
  //
  // T26's invisible-strip is WRONG for half the world's scripts: ZWNJ
  // (U+200C) is orthographic in Persian/Arabic (می‌روم is one word, its
  // ZWNJ load-bearing) and ZWJ/ZWNJ control conjunct formation in the
  // Brahmic family (क्‍ष vs क्ष are different renderings a corpus must
  // not silently merge) — blanket-stripping them corrupts the text the
  // way stripping apostrophes would corrupt English. CJK adds the dual
  // problem: fullwidth ASCII forms (Ｈ！) and the ideographic space
  // U+3000 are byte-distinct spellings of characters Latin processing
  // already normalizes, so CJK documents need MORE folding, not less.
  //
  // The profile law is PRESENCE-BASED and conservative, detected on the
  // raw input: any joining-script character (Arabic/Indic ranges) in the
  // document ⇒ ZWNJ/ZWJ may be orthographic ⇒ keep them everywhere in
  // that document (strip only ZWSP/BOM/soft-hyphen, which carry meaning
  // in no script); any CJK character ⇒ fold fullwidth ASCII to ASCII and
  // U+3000 to space BEFORE whitespace collapsing. The two flags are
  // independent — a mixed Persian+CJK document gets both behaviors.
  // Presence beats dominance counting because the cost asymmetry is
  // total: keeping a stray ZWNJ in a Latin doc is one invisible byte;
  // stripping one from a Persian doc destroys a word boundary.

  /** Joining-script detector: Arabic block + supplements, Brahmic family
    * (Devanagari through Sinhala). Explicit codepoint ranges, not
    * \\p{script=...} classes, so the DuckDB oracle runs the IDENTICAL
    * pattern (RE2 and Java agree on \\x{...} ranges; they disagree on
    * script-class spelling). */
  val JoiningScriptRe: String =
    "[\\x{0600}-\\x{06FF}\\x{0750}-\\x{077F}\\x{08A0}-\\x{08FF}\\x{0900}-\\x{0DFF}]"

  /** CJK detector: CJK ideographs, kana, hangul, CJK punctuation +
    * fullwidth forms. */
  val CjkRe: String =
    "[\\x{3000}-\\x{30FF}\\x{3400}-\\x{4DBF}\\x{4E00}-\\x{9FFF}\\x{AC00}-\\x{D7AF}\\x{F900}-\\x{FAFF}\\x{FF01}-\\x{FF60}]"

  /** Fullwidth ASCII forms U+FF01..U+FF5E plus the ideographic space
    * U+3000 — and their halfwidth images, by position (translate maps
    * char i → char i). */
  val FullwidthFrom: String = (0xFF01 to 0xFF5E).map(_.toChar).mkString + "　"
  val HalfwidthTo: String = (0x21 to 0x7E).map(_.toChar).mkString + " "

  /** Profile name from the raw text — observability for curation audits
    * (and the gate's hashed evidence that detection fired per document).
    * One concrete catalyst tree shared with the SQL surface
    * (`text_profile`), the T26/D15 discipline. */
  def textProfile(text: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.NativeExpressions.textProfileExpr(
      ColumnBridge.expression(text)))
  }

  /** T27: the T26 chain with the invisible-strip and width steps switched
    * per detected profile. Same shape as T26 — one codegen'd projection
    * pass, no UDF, no shuffle; the two rlike detections run on the raw
    * input column so the profile is independent of the cleanup order.
    * Shares its catalyst tree with the SQL surface (`normalize_text_ml`). */
  def normalizeTextMultilingual(text: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.NativeExpressions.normalizeTextMlExpr(
      ColumnBridge.expression(text)))
  }

  /** Whitespace token count. */
  def wsTokens(text: Column): Column = size(split(trim(text), "\\s+"))

  /** BPE-ish token count: letter runs, digit runs, and individual symbols —
    * the pre-tokenization regex family GPT-style BPEs apply before merges. */
  def bpeTokens(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Ratio of non-alphanumeric, non-space chars. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, 0.0)
      .otherwise(length(regexp_replace(text, "[A-Za-z0-9 ]", "")).cast("double") / length(text))

  /** Mean token length in characters. */
  def meanTokenLen(text: Column): Column =
    when(wsTokens(text) === 0, 0.0)
      .otherwise(length(regexp_replace(text, "\\s+", "")).cast("double") / wsTokens(text))

  /** Stopword ratio against a small built-in English list — the classic
    * "is this prose or noise" curation signal. */
  val Stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was",
    "for", "on", "with", "as", "at", "by", "that", "this", "it", "be")

  def stopwordRatio(text: Column): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    val stops = filter(toks, t => t.isInCollection(Stopwords))
    when(size(toks) === 0, 0.0).otherwise(size(stops).cast("double") / size(toks))
  }

  /** Repetition: 1 - distinct-token ratio (high = boilerplate/spam). */
  def repetitionRatio(text: Column): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    when(size(toks) === 0, 0.0)
      .otherwise(lit(1.0) - size(array_distinct(toks)).cast("double") / size(toks))
  }

  /** Composite quality gate used by the curation pipeline. */
  def isQuality(text: Column, minChars: Int = 100, maxPunct: Double = 0.1): Column =
    length(text) >= minChars && punctRatio(text) < maxPunct

  // ---- PII redaction (T8): compliance scrub before training ----

  /** Conservative PII patterns, deliberately restricted to the regex subset
    * where Java regex (Spark) and RE2 (DuckDB, and most scale engines) agree
    * — character classes, bounded repetition, word boundaries; no lookaround,
    * no backreferences. That keeps the scrub portable AND linear-time (RE2
    * guarantees no catastrophic backtracking — the property you want when an
    * adversarial 100 TB corpus meets your regex). */
  val EmailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe: String = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"
  val Ipv4Re:  String = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Replace emails / phone numbers / IPv4s with typed placeholder tokens.
    * Pure codegen'd projection — one pass, no UDF. Order matters: emails
    * first (an email's domain must not be half-eaten by the IP pattern). */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      Ipv4Re, "<IP>")

  /** Per-kind match counts (audit columns for the scrub). */
  def piiCounts(text: Column): Seq[(String, Column)] = Seq(
    "n_emails" -> size(regexp_extract_all(text, lit(EmailRe), lit(0))),
    "n_phones" -> size(regexp_extract_all(text, lit(PhoneRe), lit(0))),
    "n_ips"    -> size(regexp_extract_all(text, lit(Ipv4Re), lit(0))))

  // ---- language ID (T1): char-trigram profiles, pure column algebra ----

  /** Tiny built-in char-trigram/stopword profiles per language. Honest
    * heuristic: score = Σ matches of language-characteristic tokens &
    * trigrams; best score wins, "und" unknown when nothing matches. */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq(" the ", " and ", " of ", " is ", " that ", "ing ", " with "),
    "de" -> Seq(" der ", " die ", " das ", " und ", " ist ", " nicht ", "sch", " ein "),
    "fr" -> Seq(" le ", " la ", " les ", " et ", " est ", " une ", " dans ", " pour "),
    "es" -> Seq(" el ", " los ", " y ", " es ", " una ", " que ", "ción", " para "),
    "zh" -> Seq("的", "是", "了", "在", "我", "有"))

  def langScore(text: Column, lang: String): Column = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    LangMarkers(lang)
      .map(m => when(padded.contains(m), 1).otherwise(0))
      .reduce(_ + _)
  }

  /** Detected language code, or "und" when no marker fires. */
  def detectLang(text: Column): Column = {
    val langs  = LangMarkers.keys.toSeq.sorted
    val scored = langs.map(l => struct(langScore(text, l).as("score"), lit(l).as("lang")))
    val best   = greatest(scored: _*)
    when(best.getField("score") === 0, "und").otherwise(best.getField("lang"))
  }

  /** Corpus-scale language ID: stages the padded lowercase text as a column
    * so the ~40 marker probes share one normalization instead of each
    * re-lowering the document (the lambda/captured-subtree rule — see
    * SURVEY.md §4). Adds `outCol` to `df`. */
  def withDetectedLang(df: org.apache.spark.sql.DataFrame, textCol: String,
      outCol: String = "detected_lang"): org.apache.spark.sql.DataFrame = {
    val langs = LangMarkers.keys.toSeq.sorted
    val staged = df.withColumn("__padded", concat(lit(" "), lower(col(textCol)), lit(" ")))
    val scored = langs.map { l =>
      val hits = LangMarkers(l).map(m => when(col("__padded").contains(m), 1).otherwise(0))
      struct(hits.reduce((a, b) => a + b).as("score"), lit(l).as("lang"))
    }
    val best = greatest(scored: _*)
    staged
      .withColumn(outCol, when(best.getField("score") === 0, "und").otherwise(best.getField("lang")))
      .drop("__padded")
  }

  // ---- TF-IDF (T5) ----

  /** Term frequencies per document plus corpus document frequencies and the
    * tf-idf score — the relevance/quality primitive for corpus filtering.
    * Scale shape: one explode + two aggregations sharing the `term` shuffle
    * key; the df side is tiny (vocabulary-sized) and broadcasts into the
    * join at planning or AQE time.
    */
  def tfidf(df: org.apache.spark.sql.DataFrame, textCol: String, idCol: String)
      : org.apache.spark.sql.DataFrame = {
    val toks = df.select(col(idCol), explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
    val tf   = toks.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = toks.groupBy(col("term")).agg(countDistinct(col(idCol)).as("df"))
    // corpus size as a broadcast 1-row aggregate INSIDE the plan — a
    // driver-side df.count() here would be a whole extra corpus pass per call
    val n = df.agg(count(lit(1)).cast("double").as("__n"))
    tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf", col("tf") * log(col("__n") / col("df")))
      .drop("__n")
  }

  // ---- fingerprinting (T4) ----

  /** Polynomial rolling hash over the document's characters:
    * h = fold(h*31 + codepoint) mod 1e9+7 — the classic Rabin-Karp
    * fingerprint, as a native codegen'd expression (the `split(text, "")` +
    * `aggregate` HOF formulation allocated a per-char string array per
    * document and evaluated interpreted).
    */
  def fingerprint(text: Column): Column =
    graft.functions.NativeExpressions.polyFingerprint(text)

  /** Shingle fingerprints: hash of each k-word window — the building block
    * for MinHash and content-defined chunking. */
  def wordShingles(text: Column, k: Int): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    when(size(toks) < k, array(xxhash64(concat_ws(" ", toks))))
      .otherwise(transform(
        sequence(lit(0), size(toks) - k),
        i => xxhash64(concat_ws(" ", slice(toks, i + 1, lit(k))))))
  }

  /** T18: bigram-LM document scoring — each document's mean corpus
    * frequency over its bigram instances, the integerized form of the
    * CCNet/Gopher "LM-likelihood" quality signal: documents whose word
    * pairs are common across the corpus score high (boilerplate,
    * templates, natural prose), documents full of corpus-rare bigrams
    * score low (garbled text, exotic tokens, OCR noise) — both tails are
    * curation targets. score = floor(Σ cf(bigram) * scale / n_bigrams),
    * all in longs, so any engine derives identical scores (a
    * floating-point perplexity would be accumulation-order-dependent and
    * unverifiable); docs under 2 tokens have no bigrams and are omitted.
    *
    * Scale shape: two partial-aggregated shuffles (corpus bigram counts;
    * per-doc rollup) plus one shuffle join bigram-instances × counts — the
    * same frequency-join shape as TF-IDF (T5), no driver state, no UDF.
    * The model "training" IS the corpus count — self-supervised on the
    * data it scores, refreshable by re-running one aggregate. */
  def bigramCommonness(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, scale: Long = 1000L): org.apache.spark.sql.DataFrame = {
    val toks = split(lower(trim(col(textCol))), "\\s+")
    val grams = df.select(col(idCol), toks.as("__t"))
      .filter(size(col("__t")) >= 2)
      .select(col(idCol), explode(transform(
        sequence(lit(0), size(col("__t")) - 2),
        i => concat_ws(" ", slice(col("__t"), i + 1, lit(2))))).as("ngram"))
    val cf = grams.groupBy("ngram").agg(count(lit(1)).as("cf"))
    grams.join(cf, "ngram")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"), sum("cf").as("__s"))
      // ≡ (__s * scale) div n, computed WITHOUT the product: Σcf can reach
      // ~1e17 on a boilerplate-heavy web corpus and ×1000 would wrap a
      // long (while the SQL oracle's HUGEINT would not — a divergence
      // exactly at the scale the integer design protects); the quotient/
      // remainder split keeps every intermediate ≤ max(Σcf, n·scale)
      .select(col(idCol), col("n_bigrams"),
        (expr("__s div n_bigrams") * scale +
          expr(s"((__s % n_bigrams) * $scale) div n_bigrams"))
          .as(s"avg_bigram_cf_x$scale"))
  }

  /** T9: top-k n-grams per group — the corpus-statistics op behind stopword
    * lists, contamination fingerprints and domain-drift dashboards. Shape:
    * explode n-grams (strings, not hashes — the output is human-facing),
    * one partial-aggregated count shuffle, then the bounded-heap TopK plan
    * node (P1) for the per-group cut: at 100 TB the count table still holds
    * billions of (group, ngram) rows, and the window-rank formulation would
    * sort each group's full vocabulary on one partition — the heap keeps
    * groups × k rows. Ties break lexicographically for determinism. */
  def topNgrams(df: org.apache.spark.sql.DataFrame, textCol: String,
      groupCol: String, n: Int = 2, k: Int = 5): org.apache.spark.sql.DataFrame = {
    val toks = split(lower(trim(col(textCol))), "\\s+")
    val grams = df
      .select(col(groupCol), toks.as("__t"))
      .filter(size(col("__t")) >= n)
      .select(col(groupCol), explode(transform(
        sequence(lit(0), size(col("__t")) - n),
        i => concat_ws(" ", slice(col("__t"), i + 1, lit(n))))).as("ngram"))
    val counts = grams.groupBy(col(groupCol), col("ngram"))
      .agg(count(lit(1)).as("n"))
    graft.plans.TopK.perGroupOrdered(counts, Seq(groupCol),
      Seq(("n", false), ("ngram", true)), k)
  }

  /** T10: sliding-window document chunking — split each document into
    * token windows of `chunkTokens` with `overlap` tokens shared between
    * consecutive chunks (the training-sequence prep step between curation
    * and tokenization). Emits (idCol, chunk_id, chunk_text, n_tokens); the
    * last chunk may be shorter than `chunkTokens`, never empty, and a doc
    * of ≤ `chunkTokens` tokens yields exactly one chunk.
    *
    * Scale shape: one narrow codegen'd projection + explode — no shuffle,
    * no UDF; output rows ≈ n_tokens/stride per doc. The token array is
    * staged once per row (not re-split per chunk), and chunk count is
    * integer arithmetic (`div`), so the same chunks come out on any engine
    * and any partitioning.
    */
  def chunkDocs(df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlap: Int): org.apache.spark.sql.DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      s"need 0 <= overlap < chunkTokens, got chunkTokens=$chunkTokens overlap=$overlap")
    val stride = chunkTokens - overlap
    df.select(col(idCol), split(trim(col(textCol)), "\\s+").as("__toks"))
      .withColumn("__n", size(col("__toks")))
      // integer ceil((n - chunk)/stride) + 1; `div` keeps it exact on both
      // engines (Spark `/` on ints is double division)
      .withColumn("__nc",
        when(col("__n") <= chunkTokens, 1).otherwise(
          expr(s"((__n - $chunkTokens + ${stride - 1}) div $stride) + 1")))
      .select(col(idCol), col("__toks"), col("__n"),
        posexplode(sequence(lit(0), col("__nc") - 1)).as(Seq("__p", "chunk_id")))
      .select(
        col(idCol),
        col("chunk_id").cast("long").as("chunk_id"),
        concat_ws(" ", slice(col("__toks"), col("chunk_id") * stride + 1, lit(chunkTokens)))
          .as("chunk_text"),
        least(lit(chunkTokens), col("__n") - col("chunk_id") * stride)
          .cast("long").as("n_tokens"))
  }

  /** T12: sequence packing — assign documents (or T10 chunks) to fixed-size
    * training sequences by the concat-and-chunk rule LLM pretraining uses:
    * order documents deterministically, concatenate, and cut the token
    * stream every `seqLen` tokens. Each row gets (shard, seq_id, seq_off):
    * the sequence whose block its START offset falls in and its offset
    * within that sequence (a doc longer than the remaining room simply runs
    * into the next block — boundary metadata for the tokenizer, which is
    * exactly how packed pretraining batches handle document overflow).
    *
    * Determinism + scale shape: rows are ordered by (md5(id), id) WITHIN a
    * hash shard (`hashUnit(id) mod shards`) — pure functions of the id, so
    * the same packing comes out on any cluster, partitioning or engine, and
    * the cumulative-sum window runs per shard, never globally: shard count
    * bounds the window partition size (at 100 TB, thousands of shards →
    * each a few GB of offsets; one shuffle total). All md5 arithmetic is
    * the T6 split machinery, so DuckDB re-derives the packing exactly. */
  def packSequences(df: org.apache.spark.sql.DataFrame, idCol: String,
      tokenCol: String, seqLen: Int, shards: Int = 1024): org.apache.spark.sql.DataFrame = {
    require(seqLen > 0 && shards > 0, s"need seqLen/shards > 0, got $seqLen/$shards")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("__u"), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.withColumn("shard", pmod(Sampling.hashUnit(col(idCol)), lit(shards.toLong)))
      .withColumn("__u", md5(col(idCol).cast("string")))
      .withColumn("__off", coalesce(sum(col(tokenCol).cast("long")).over(w), lit(0L)))
      .withColumn("seq_id", expr(s"__off div $seqLen"))
      .withColumn("seq_off", col("__off") - col("seq_id") * seqLen)
      .drop("__u", "__off")
  }

  /** T14: intra-document repetition profile — the Gopher-style repetition
    * signals (duplicate-line fraction, duplicate-line character fraction,
    * top-n-gram share) used to drop machine-generated/spam pages whose
    * repetition is INSIDE one document, which no cross-document dedup
    * (D1-D6) can see. Emits one row per input row:
    * (idCol, n_lines, dup_lines, dup_line_chars, n_ngrams, top_ngram_n,
    * is_repetitive) — every signal an exact INTEGER (numerators and
    * denominators, not fractions), so the oracle hash cannot drift on
    * float division, and the keep/drop decision is integer arithmetic:
    * repetitive ⇔ dup_lines/n_lines ≥ 30% OR top_ngram_n/n_ngrams ≥ 20%.
    *
    * Scale shape: line statistics are per-row higher-order-function algebra
    * (split → trim → distinct → length sums) inside WholeStageCodegen — no
    * shuffle, no state. The n-gram mode needs per-(doc, gram) counts: one
    * clustering shuffle on (id, gram) with map-side partial counts, then a
    * doc-level rollup; the doc-constant line stats ride the grouping keys
    * (small ints) instead of a second join against the corpus. Output rows
    * = input rows; nothing global anywhere. The shuffled gram key is the
    * 8-byte codegen'd shingle HASH, not the gram string (the d4 kernel):
    * counts over hashes equal counts over strings absent 64-bit collisions
    * (the d4/d7 argument), and the one corpus-linear shuffle ships fixed
    * 8-byte keys instead of ~2×n-gram-length strings. */
  def repetitionProfile(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, ngramN: Int = 2): org.apache.spark.sql.DataFrame = {
    require(ngramN >= 1, s"need ngramN >= 1, got $ngramN")
    val lines = filter(transform(split(col(textCol), "\n"), l => trim(l)),
      l => length(l) > 0)
    val toks = split(lower(trim(col(textCol))), "\\s+")
    val charSum = (a: Column) =>
      aggregate(a, lit(0L), (acc, l) => acc + length(l))
    val base = df.select(
      col(idCol),
      size(lines).cast("long").as("n_lines"),
      (size(lines) - size(array_distinct(lines))).cast("long").as("dup_lines"),
      (charSum(lines) - charSum(array_distinct(lines))).as("dup_line_chars"),
      when(size(toks) < ngramN, array().cast("array<bigint>"))
        .otherwise(graft.functions.NativeExpressions.wordShingleHashes(toks, ngramN))
        .as("__gs"))
    base
      .select(col(idCol), col("n_lines"), col("dup_lines"), col("dup_line_chars"),
        explode_outer(col("__gs")).as("__g"))
      .groupBy(idCol, "n_lines", "dup_lines", "dup_line_chars", "__g")
      .agg(count(col("__g")).as("__n"))
      .groupBy(idCol, "n_lines", "dup_lines", "dup_line_chars")
      .agg(sum("__n").as("n_ngrams"), max("__n").as("top_ngram_n"))
      .withColumn("is_repetitive",
        (col("n_lines") > 0 && col("dup_lines") * 10 >= col("n_lines") * 3) ||
          (col("n_ngrams") > 0 && col("top_ngram_n") * 5 >= col("n_ngrams")))
  }

  /** T13: boilerplate line removal — strip lines whose trimmed form occurs
    * in at least `maxDocFrac` of documents (cookie banners, navigation
    * chrome, site footers): the corpus-frequency scrub web-crawl curation
    * runs before dedup, because boilerplate both wastes tokens and inflates
    * near-dup similarity between unrelated pages. Line order within each
    * document is preserved; documents reduced to nothing come back as ""
    * (they remain rows — dropping them is a quality-filter decision, T2's
    * job). Lines are counted ONCE per document (array_distinct before the
    * explode), so a page repeating its own footer doesn't inflate the
    * corpus frequency.
    *
    * Scale shape: the frequent-line set is provably tiny — at most
    * avgLinesPerDoc / maxDocFrac distinct lines can each appear in
    * ≥ maxDocFrac·N docs — so the anti-join's build side stays
    * broadcast-sized at ANY corpus size (no hint needed; AQE sees a
    * few-row aggregate). One groupBy on trimmed lines + one anti-join;
    * reassembly is a per-doc sort_array, never a global sort. `knownN`
    * supplies the doc count (footer/catalog stats); absent, one count()
    * pass. */
  def stripBoilerplate(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, maxDocFrac: Double = 0.5, minDocs: Long = 2,
      knownN: Long = -1L): org.apache.spark.sql.DataFrame = {
    require(maxDocFrac > 0 && maxDocFrac <= 1, s"need 0 < maxDocFrac <= 1, got $maxDocFrac")
    val n = if (knownN >= 0) knownN else df.count()
    val thresh = math.max(minDocs, math.ceil(maxDocFrac * n).toLong)
    val lines = df.select(col(idCol), split(col(textCol), "\n").as("__ls"))
    val freq = lines
      .select(explode(array_distinct(transform(col("__ls"), l => trim(l)))).as("__line"))
      .filter(length(col("__line")) > 0)
      .groupBy("__line").agg(count(lit(1)).as("__d"))
      .filter(col("__d") >= thresh)
      .select("__line")
    val kept = lines
      .select(col(idCol), posexplode(col("__ls")).as(Seq("__p", "__l")))
      .join(freq, trim(col("__l")) === col("__line"), "left_anti")
    val rebuilt = kept.groupBy(idCol)
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("__p"), col("__l")))),
          s => s.getField("__l")), "\n").as("clean_text"))
    df.select(col(idCol))
      .join(rebuilt, Seq(idCol), "left")
      .withColumn("clean_text", coalesce(col("clean_text"), lit("")))
  }

  /** T24: token-frequency DRIFT between two corpus versions — the data
    * monitor a production pipeline runs on every refresh ("did the crawl
    * change under us?"): per-token counts of both sides, full-outer
    * joined, ranked by absolute count change. Exact integers end to end
    * (counts and deltas, no floating divergence measure in the hash
    * path), deterministic (delta desc, token asc) order, top `k` via
    * TakeOrdered — per-partition heaps + driver merge, never a global
    * sort. One shuffle per side on the token key with map-side partial
    * counts; tokens, not documents, cross the wire. */
  def tokenDrift(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame,
      textCol: String, k: Int = 50): org.apache.spark.sql.DataFrame = {
    def counts(df: org.apache.spark.sql.DataFrame) = df
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("c"))
    counts(a).withColumnRenamed("c", "c_a")
      .join(counts(b).withColumnRenamed("c", "c_b"), Seq("token"), "full")
      .na.fill(0L, Seq("c_a", "c_b"))
      .withColumn("delta", abs(col("c_a") - col("c_b")))
      .orderBy(col("delta").desc, col("token"))
      .limit(k)
  }

  /** T22: Gopher-style quality rule profile (Rae et al. 2021,
    * arXiv:2112.11446 — the deployed document-filter subset): per-doc rule
    * measurements plus the conjunctive `keep` flag real curation stacks
    * threshold on. Rules: word count in [minWords, maxWords]; mean word
    * length in [3, 10]; symbol-to-word ratio (`#` chars + `...` runs) ≤
    * 0.1; ≤ 90% bullet-started lines; ≤ 30% ellipsis-ended lines;
    * duplicate-line fraction ≤ 0.3; ≥ 2 distinct stopwords present.
    *
    * Scale: pure projection — every measurement is a builtin regex/HOF
    * expression inside whole-stage codegen; no shuffle, no UDF, and the
    * whole profile is one pass over the text column. Deliberately restricted
    * to the Java-regex ∩ RE2 subset (the T8 discipline) so the exact rules
    * replay on any engine. */
  def gopherRules(df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000): org.apache.spark.sql.DataFrame = {
    val text = col(textCol)
    val empty = length(trim(text)) === 0
    val words = split(trim(text), "\\s+")
    val nWords = when(empty, lit(0)).otherwise(size(words)).cast("long")
    val meanLen = when(nWords === 0, lit(0.0))
      .otherwise(length(regexp_replace(text, "\\s+", "")).cast("double") / nWords)
    val nSymbols = (length(text) - length(regexp_replace(text, "#", ""))) +
      size(regexp_extract_all(text, lit("\\.\\.\\."), lit(0)))
    val symbolRatio = when(nWords === 0, lit(0.0))
      .otherwise(nSymbols.cast("double") / nWords)
    val lines = split(text, "\n")
    val nLines = size(lines)
    val bulletFrac = when(empty, lit(0.0)).otherwise(
      size(filter(lines, l => ltrim(l).startsWith("- ") || ltrim(l).startsWith("* ")))
        .cast("double") / nLines)
    val ellipsisFrac = when(empty, lit(0.0)).otherwise(
      size(filter(lines, l => rtrim(l).endsWith("..."))).cast("double") / nLines)
    val nonblank = filter(transform(lines, l => trim(l)), l => length(l) > 0)
    val dupFrac = when(size(nonblank) === 0, lit(0.0))
      .otherwise(lit(1.0) -
        size(array_distinct(nonblank)).cast("double") / size(nonblank))
    val toks = split(lower(trim(text)), "\\s+")
    val stopHits = size(filter(
      array(Stopwords.map(lit): _*), s => array_contains(toks, s))).cast("long")
    df.select(col(idCol),
        nWords.as("n_words"),
        meanLen.as("mean_word_len"),
        symbolRatio.as("symbol_word_ratio"),
        bulletFrac.as("bullet_line_frac"),
        ellipsisFrac.as("ellipsis_line_frac"),
        dupFrac.as("dup_line_frac"),
        stopHits.as("n_stop_hits"))
      .withColumn("keep",
        col("n_words").between(minWords, maxWords) &&
        col("mean_word_len").between(3.0, 10.0) &&
        col("symbol_word_ratio") <= 0.1 &&
        col("bullet_line_frac") <= 0.9 &&
        col("ellipsis_line_frac") <= 0.3 &&
        col("dup_line_frac") <= 0.3 &&
        col("n_stop_hits") >= 2)
  }
}
