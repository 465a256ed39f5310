package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("token counts and ratios (T2/T3)") {
    val r = Seq("Hello world, 42 things!").toDF("text")
      .select(
        TextAnalysis.wsTokens(col("text")).as("ws"),
        TextAnalysis.bpeTokens(col("text")).as("bpe"),
        TextAnalysis.punctRatio(col("text")).as("punct"))
      .collect().head
    r.getInt(0) shouldBe 4
    // Hello|world|,|42|things|! → 6
    r.getInt(1) shouldBe 6
    r.getDouble(2) shouldBe (2.0 / 23) +- 1e-9
  }

  test("stopword and repetition ratios (T2)") {
    val r = Seq("the cat and the dog and the bird").toDF("text")
      .select(
        TextAnalysis.stopwordRatio(col("text")).as("stop"),
        TextAnalysis.repetitionRatio(col("text")).as("rep"))
      .collect().head
    r.getDouble(0) shouldBe (5.0 / 8) +- 1e-9  // the,and,the,and,the
    r.getDouble(1) shouldBe (1.0 - 5.0 / 8) +- 1e-9
  }

  test("language ID detects real sentences (T1)") {
    val out = Seq(
      ("en", "the cat sat on the mat and it was happy with that"),
      ("de", "der hund und die katze sind nicht im haus"),
      ("fr", "le chien est dans la maison et les chats sont pour nous"),
      ("es", "el perro es una mascota que vive para siempre"),
      ("zh", "我是一个学生，我的老师是中国人"),
      ("und", "xyzzy plugh qwertzuiop"))
      .toDF("expected", "text")
      .withColumn("detected", TextAnalysis.detectLang(col("text")))
      .collect()
    out.foreach(r => r.getString(2) shouldBe r.getString(0))
  }

  test("withDetectedLang (staged) agrees with detectLang (T1)") {
    val df = Seq("the cat sat on the mat", "der hund und die katze", "xyzzy")
      .toDF("text")
    val staged = TextAnalysis.withDetectedLang(df, "text").select("detected_lang")
    val direct = df.select(TextAnalysis.detectLang(col("text")).as("detected_lang"))
    staged.collect().map(_.getString(0)).toSeq shouldBe direct.collect().map(_.getString(0)).toSeq
  }

  test("fingerprint matches hand-computed rolling hash (T4)") {
    def ref(s: String): Long = s.foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % 1000000007L)
    val inputs = Seq("abc", "hello world", "the quick brown fox")
    val got = inputs.toDF("text")
      .select(TextAnalysis.fingerprint(col("text")).as("fp")).as[Long].collect()
    got.toSeq shouldBe inputs.map(ref)
  }

  test("tfidf: rare terms outscore ubiquitous ones (T5)") {
    val docs = Seq(
      (1L, "common common rare"),
      (2L, "common words here"),
      (3L, "common again words")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidf(docs, "text", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    out(("common", 1L))._2 shouldBe 3L     // df: in all docs
    out(("rare", 1L))._2 shouldBe 1L
    out(("rare", 1L))._3 should be > out(("common", 1L))._3 // tfidf despite tf 1 vs 2
    out(("common", 1L))._3 shouldBe 0.0 +- 1e-12            // ln(3/3) = 0
  }

  test("wordShingles produces n-k+1 shingles and handles short docs (T4/D2)") {
    val n = Seq("a b c d e").toDF("text")
      .select(org.apache.spark.sql.functions.size(TextAnalysis.wordShingles(col("text"), 3)).as("n")).as[Int].collect().head
    n shouldBe 3
    val short = Seq("a b").toDF("text")
      .select(org.apache.spark.sql.functions.size(TextAnalysis.wordShingles(col("text"), 3)).as("n")).as[Int].collect().head
    short shouldBe 1
  }

  test("redactPii scrubs emails, phones and IPs; counts audit them (T8)") {
    val df = Seq(
      "mail me at jane.doe+x@sub.example.org today",
      "call 555-123-4567 or 555.987.6543 now",
      "server at 192.168.1.100 responded",
      "no pii here at all",
      "combo: a@b.io and 111-222-3333 via 10.0.0.1").toDF("text")
    val out = df.select(
      TextAnalysis.redactPii(col("text")).as("r"),
      TextAnalysis.piiCounts(col("text")).head._2.as("n_emails"))
      .collect()
    out(0).getString(0) shouldBe "mail me at <EMAIL> today"
    out(1).getString(0) shouldBe "call <PHONE> or <PHONE> now"
    out(2).getString(0) shouldBe "server at <IP> responded"
    out(3).getString(0) shouldBe "no pii here at all"
    out(4).getString(0) shouldBe "combo: <EMAIL> and <PHONE> via <IP>"
    out.map(_.getInt(1)).toSeq shouldBe Seq(1, 0, 0, 0, 1)
  }

  test("chunkDocs windows with overlap; short docs yield one chunk (T10)") {
    val doc = (1 to 10).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, doc), (2L, "a b c")).toDF("doc_id", "text")
    val out = TextAnalysis.chunkDocs(df, "doc_id", "text", chunkTokens = 4, overlap = 1)
      .orderBy("doc_id", "chunk_id").collect()
    // doc 1: 10 tokens, stride 3 → starts 0,3,6 (start 6 reaches the end,
    // so no redundant tail chunk is emitted)
    val c1 = out.filter(_.getLong(0) == 1L)
    c1.map(_.getString(2)).toSeq shouldBe Seq(
      "w1 w2 w3 w4", "w4 w5 w6 w7", "w7 w8 w9 w10")
    c1.map(_.getLong(3)).toSeq shouldBe Seq(4L, 4L, 4L)
    // consecutive chunks share exactly `overlap` boundary tokens
    c1.sliding(2).foreach { case Array(a, b) =>
      a.getString(2).split(" ").last shouldBe b.getString(2).split(" ").head
    }
    // doc 2: 3 ≤ chunkTokens → exactly one chunk, intact
    out.filter(_.getLong(0) == 2L).map(_.getString(2)).toSeq shouldBe Seq("a b c")
  }

  test("stripBoilerplate removes corpus-frequent lines, keeps rare ones in order (T13)") {
    val df = Seq(
      (1L, "HEADER\nalpha body one\nFOOTER"),
      (2L, "HEADER\nbeta body two\nrare note\nFOOTER"),
      (3L, "HEADER\ngamma body three\nFOOTER"),
      (4L, "HEADER\nFOOTER")).toDF("doc_id", "text")
    val out = TextAnalysis.stripBoilerplate(df, "doc_id", "text", maxDocFrac = 0.5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // HEADER/FOOTER in 4/4 docs → stripped; bodies + the rare note survive
    out(1L) shouldBe "alpha body one"
    out(2L) shouldBe "beta body two\nrare note" // line order preserved
    out(3L) shouldBe "gamma body three"
    out(4L) shouldBe "" // all-boilerplate doc stays a row, empty
    // a doc repeating its own footer counts ONCE toward corpus frequency:
    // 2 of 4 docs < ceil(0.5*4)=2... (>= thresh) — at exactly the
    // threshold it IS stripped; one below it is kept
    val half = Seq(
      (1L, "X\nX\na"), (2L, "X\nb"), (3L, "c"), (4L, "d")).toDF("doc_id", "text")
    val o2 = TextAnalysis.stripBoilerplate(half, "doc_id", "text", maxDocFrac = 0.5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    o2(1L) shouldBe "a" // X hit 2 docs = threshold → stripped, dup counted once
    o2(2L) shouldBe "b"
    // empty and whitespace-only lines are never treated as boilerplate
    val ws = Seq((1L, "p\n\nq"), (2L, "r\n\ns"), (3L, "t\n\nu")).toDF("doc_id", "text")
    val o3 = TextAnalysis.stripBoilerplate(ws, "doc_id", "text", maxDocFrac = 0.5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    o3(1L) shouldBe "p\n\nq"
  }

  test("packSequences assigns concat-and-chunk offsets deterministically (T12)") {
    val df = (0L until 400L).map(i => (i, 10L + i % 7)).toDF("id", "toks")
    val out = TextAnalysis.packSequences(df, "id", "toks", seqLen = 64, shards = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    out.size shouldBe 400
    // offsets stay inside the sequence block
    out.values.foreach { case (_, seqId, seqOff) =>
      seqOff should be >= 0L
      seqOff should be < 64L
      seqId should be >= 0L
    }
    // partitioning-independent: pure function of (id, toks)
    val again = TextAnalysis.packSequences(df.repartition(13), "id", "toks", 64, 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    again shouldBe out
    // per shard, assignments equal a local concat-and-chunk reference:
    // order by (md5(id), id), prefix-sum the tokens, cut every 64
    val rows = TextAnalysis.packSequences(df, "id", "toks", 64, 4)
      .select("id", "toks", "shard", "seq_id", "seq_off")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    rows.groupBy(_._3).values.foreach { shard =>
      var off = 0L
      shard.sortBy(r => (md5hex(r._1.toString), r._1)).foreach { case (_, toks, _, seqId, seqOff) =>
        seqId shouldBe off / 64
        seqOff shouldBe off % 64
        off += toks
      }
    }
  }

  test("repetitionProfile counts duplicate lines and modal ngrams exactly (T14)") {
    val docs = Seq(
      // 4 non-empty lines, "a b" twice (dup_lines=1, dup chars=3); 9
      // tokens → 8 bigrams (\n is token whitespace), "a b" modal at 2,
      // and 2/8 = 25% ≥ 20% trips the top-ngram arm
      (1L, "x y\na b\na b\nz w q"),
      // spam run: 5 tokens, "spam spam" ×4 of 4 bigrams → repetitive
      (2L, "spam spam spam spam spam"),
      // single token: no bigrams; one line
      (3L, "hello"),
      // empty text: no lines, no ngrams, not repetitive
      (4L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionProfile(docs, "doc_id", "text", ngramN = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6)))).toMap
    out(1L) shouldBe ((4L, 1L, 3L, 8L, 2L, true))
    out(2L) shouldBe ((1L, 0L, 0L, 4L, 4L, true))
    out(3L) shouldBe ((1L, 0L, 0L, 0L, 0L, false))
    out(4L) shouldBe ((0L, 0L, 0L, 0L, 0L, false))
    // partitioning-independent: pure per-doc function
    val again = TextAnalysis.repetitionProfile(docs.repartition(7), "doc_id", "text", 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6)))).toMap
    again shouldBe out
  }

  test("bigramCommonness scores by hand-checked corpus frequencies (T18)") {
    val docs = Seq(
      (1L, "a b a b"),  // bigrams: "a b","b a","a b" — n=3, Σcf=3+1+3=7
      (2L, "a b"),      // "a b" — n=1, Σcf=3
      (3L, "x y"),      // "x y" — n=1, Σcf=1
      (4L, "solo"),     // 1 token: no bigrams, omitted
      (5L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramCommonness(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    out shouldBe Map(
      1L -> ((3L, 7L * 1000 / 3)), // 2333: floor division
      2L -> ((1L, 3000L)),
      3L -> ((1L, 1000L)))
    // partitioning-independent: counts and integer division are exact
    TextAnalysis.bigramCommonness(docs.repartition(5), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap shouldBe out
  }

  test("tokenDrift ranks exact count changes, both directions, strict order (T24)") {
    val v1 = Seq((1L, "alpha alpha beta gamma"), (2L, "beta delta")).toDF("doc_id", "text")
    val v2 = Seq((1L, "alpha beta gamma gamma gamma"), (3L, "epsilon")).toDF("doc_id", "text")
    val out = TextAnalysis.tokenDrift(v1, v2, "text", k = 3)
      .select("token", "c_a", "c_b", "delta")
      .as[(String, Long, Long, Long)].collect().toSeq
    // gamma 1→3 (delta 2), then ties at delta 1 resolve by token asc
    // (alpha 2→1, beta 2→1; delta/epsilon also at 1 but sort later)
    out shouldBe Seq(
      ("gamma", 1L, 3L, 2L),
      ("alpha", 2L, 1L, 1L),
      ("beta", 2L, 1L, 1L))
  }

  test("gopherRules measures and gates each rule independently (T22)") {
    // 80 words, mean word length 3.9, stopwords present
    val prose = ("the quick brown foxes jumped over a lazy dog and " * 8).trim
    val docs = Seq(
      (1L, prose),                                            // passes everything
      (2L, "short but the cat is here"),                      // < 50 words
      (3L, prose + "\n" + (1 to 60).map(i => s"- b $i").mkString("\n")), // bullet frac 60/61
      (4L, prose + ("\nsame line" * 9)),                      // dup line frac 9 dup of 10
      (5L, prose + " " + ("### " * 20)),                      // symbol ratio 20/100 > 0.1
      (6L, ("verylongwordtokens " * 60).trim))                // no stopwords, mean len > 10
      .toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(docs, "doc_id", "text")
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    out shouldBe Map(1L -> true, 2L -> false, 3L -> false,
      4L -> false, 5L -> false, 6L -> false)
    val r3 = TextAnalysis.gopherRules(docs, "doc_id", "text")
      .filter(col("doc_id") === 3).head()
    r3.getAs[Double]("bullet_line_frac") shouldBe (60.0 / 61) +- 1e-12
    val r4 = TextAnalysis.gopherRules(docs, "doc_id", "text")
      .filter(col("doc_id") === 4).head()
    // 10 nonblank lines, 2 distinct (prose line + "same line")
    r4.getAs[Double]("dup_line_frac") shouldBe (1.0 - 2.0 / 10) +- 1e-12
    // empty text: all measurements zero, keep = false
    val empty = TextAnalysis.gopherRules(Seq((9L, "")).toDF("doc_id", "text"),
      "doc_id", "text").head()
    empty.getAs[Long]("n_words") shouldBe 0L
    empty.getAs[Boolean]("keep") shouldBe false
  }

  test("normalizeText composes NFC and strips invisibles (T26)") {
    // NFD e+U+0301 -> U+00E9; U+212B (Angstrom sign) -> U+00C5; BEL/ZWSP
    // stripped; CRLF -> LF; space runs collapse; 5 blank lines -> one.
    val dirty = "  \tCafe\u0301 au lait\r\nbel\u0007l\u200B and \u212B  unit" +
      "\n\n\n\n\nend  "
    val r = Seq(dirty).toDF("text")
      .select(TextAnalysis.normalizeText(col("text")).as("n"))
      .collect().head.getString(0)
    r shouldBe "Caf\u00E9 au lait\nbell and \u00C5 unit\n\nend"
  }

  test("normalizeText is idempotent and null-safe (T26)") {
    val samples = Seq(
      "plain ascii text",
      "  a\u00ADb\uFEFFc   d\te  \r\n\r\n\r\nf ",
      "o\u0308 + \u212B = A\u030A?",
      "\u200Cx\u200D yz")
    val once = samples.toDF("text")
      .select(TextAnalysis.normalizeText(col("text")).as("n"))
      .collect().map(_.getString(0))
    val twice = once.toSeq.toDF("text")
      .select(TextAnalysis.normalizeText(col("text")).as("n"))
      .collect().map(_.getString(0))
    twice.toSeq shouldBe once.toSeq
    once(0) shouldBe "plain ascii text"
    once(1) shouldBe "abc d e\n\nf"
    once(2) shouldBe "\u00F6 + \u00C5 = \u00C5?"
    once(3) shouldBe "x yz"
    val nul = Seq[Option[String]](None).toDF("text")
      .select(TextAnalysis.normalizeText(col("text")).as("n"))
      .collect().head
    nul.isNullAt(0) shouldBe true
  }

  test("nfc_normalize on the SQL surface (T26/P2)") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql("SELECT nfc_normalize('Cafe\u0301 A\u030A') AS n")
      .collect().head.getString(0)
    r shouldBe "Caf\u00E9 \u00C5"
  }

  test("profile detection is presence-based on the raw input (T27)") {
    val rows = Seq(
      "plain english",
      "t\u0645xt",                // one Arabic char is enough
      "hello \u4E16\u754C",       // Han
      "\u0645 and \u4E16",        // both
      "\uFF28\uFF29").toDF("text") // fullwidth forms count as CJK
      .select(TextAnalysis.textProfile(col("text")).as("p"))
      .collect().map(_.getString(0)).toSeq
    rows shouldBe Seq("latin", "joining", "cjk", "joining+cjk", "cjk")
  }

  test("ZWNJ/ZWJ survive in joining-script docs, die elsewhere (T27)") {
    def norm(s: String): String =
      Seq(s).toDF("text")
        .select(TextAnalysis.normalizeTextMultilingual(col("text")).as("n"))
        .collect().head.getString(0)
    // Persian \u0645\u06CC\u200C\u0631\u0648\u0645: the ZWNJ is orthographic and must survive; the
    // stray ZWSP must not
    norm("\u0645\u06CC\u200C\u0631\u0648\u0645\u200B") shouldBe
      "\u0645\u06CC\u200C\u0631\u0648\u0645"
    // Devanagari conjunct ZWJ survives
    norm("\u0915\u094D\u200D\u0937") shouldBe "\u0915\u094D\u200D\u0937"
    // the SAME ZWNJ in a pure-Latin doc is stripped (T26's law)
    norm("zap\u200Czip") shouldBe "zapzip"
    // ...but kept when ANY joining-script char appears elsewhere in the doc
    norm("zap\u200Czip \u0645") shouldBe "zap\u200Czip \u0645"
  }

  test("CJK docs fold fullwidth forms and ideographic space (T27)") {
    def norm(s: String): String =
      Seq(s).toDF("text")
        .select(TextAnalysis.normalizeTextMultilingual(col("text")).as("n"))
        .collect().head.getString(0)
    // fullwidth \uFF28 \uFF29 \uFF01 \u2192 HI!; U+3000 \u2192 space, then collapsed
    norm("\uFF28\uFF29\uFF01\u3000\u3000\u4E16\u754C") shouldBe "HI! \u4E16\u754C"
    // fullwidth in a doc with NO CJK detector hit is impossible by
    // construction (FF01-FF60 is inside the detector), so folding always
    // fires with the chars that need it \u2014 pin that coupling
    norm("\uFF41\uFF42\uFF43") shouldBe "abc"
    // pure-Latin docs never fold (the mapping can't fire without a hit)
    norm("abc  def") shouldBe "abc def"
  }

  test("multilingual chain matches T26 exactly on latin docs, stays idempotent (T27)") {
    val samples = Seq(
      "plain ascii text",
      "  a\u00ADb\uFEFFc   d\te  \r\n\r\n\r\nf ",
      "Cafe\u0301 \u212B unit",
      "\u200Cx\u200D yz",
      "\u0645\u06CC\u200C\u0631\u0648\u0645 mixed \uFF28\uFF29\u3000\u4E16")
    val viaT26 = samples.take(4).toDF("text")
      .select(TextAnalysis.normalizeText(col("text")).as("n"))
      .collect().map(_.getString(0)).toSeq
    val viaT27 = samples.toDF("text")
      .select(TextAnalysis.normalizeTextMultilingual(col("text")).as("n"))
      .collect().map(_.getString(0)).toSeq
    viaT27.take(4) shouldBe viaT26 // latin-profile docs: the laws coincide
    val twice = viaT27.toDF("text")
      .select(TextAnalysis.normalizeTextMultilingual(col("text")).as("n"))
      .collect().map(_.getString(0)).toSeq
    twice shouldBe viaT27
    val nul = Seq[Option[String]](None).toDF("text")
      .select(TextAnalysis.normalizeTextMultilingual(col("text")).as("n"))
      .collect().head
    nul.isNullAt(0) shouldBe true
  }
}
