package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL registration for the native kernels — the reference serves its users
  * a SQL database, so the Spark-side parity surface includes plain SQL:
  *
  * {{{
  *   GraftFunctions.register(spark)   // existing session
  *   spark.sql("SELECT cosine_sim(a.embedding, b.embedding) FROM ...")
  * }}}
  *
  * or, for new sessions, the proper extension wiring:
  *
  * {{{
  *   SparkSession.builder().withExtensions(new graft.GraftExtensions).…
  * }}}
  *
  * Every function resolves to a codegen'd Catalyst `Expression` — no UDF
  * boundary, identical performance to the Column API.
  */
object GraftFunctions {

  private def intArg(e: Expression, fn: String, pos: Int): Int = e match {
    case Literal(v: Int, _) => v
    case other if other.foldable =>
      other.eval() match {
        case i: Int  => i
        case l: Long => l.toInt
        case v       => throw new IllegalArgumentException(
          s"$fn: argument $pos must be a literal integer, got $v")
      }
    case _ => throw new IllegalArgumentException(
      s"$fn: argument $pos must be a literal integer")
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft.functions.GraftFunctions", name, usage)

  /** (identifier, info, builder) triples — the shape both
    * `FunctionRegistry.registerFunction` and
    * `SparkSessionExtensions.injectFunction` accept. */
  val definitions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two float/double arrays"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))),

    (FunctionIdentifier("hyperplane_bucket"),
      info("hyperplane_bucket",
        "hyperplane_bucket(vec, bits, dim, seed) - random-hyperplane LSH bucket id"),
      (args: Seq[Expression]) => HyperplaneBucket(args(0),
        intArg(args(1), "hyperplane_bucket", 2),
        intArg(args(2), "hyperplane_bucket", 3),
        intArg(args(3), "hyperplane_bucket", 4))),

    (FunctionIdentifier("minhash_signature"),
      info("minhash_signature",
        "minhash_signature(shingle_hashes, num_hashes) - MinHash signature array"),
      (args: Seq[Expression]) => MinHashSignature(args(0),
        intArg(args(1), "minhash_signature", 2))),

    (FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(token_hashes) - 64-bit SimHash signature"),
      (args: Seq[Expression]) => SimHash64(args(0))),

    (FunctionIdentifier("bpe_token_count"),
      info("bpe_token_count",
        "bpe_token_count(text) - true merge-table BPE token count (checked-in vocab)"),
      (args: Seq[Expression]) => BpeTokenCount(args(0), Bpe.merges)),

    (FunctionIdentifier("word_shingles"),
      info("word_shingles",
        "word_shingles(tokens, k) - k-word shingle hashes over a token array"),
      (args: Seq[Expression]) => WordShingleHashes(args(0),
        intArg(args(1), "word_shingles", 2))),

    (FunctionIdentifier("poly_fingerprint"),
      info("poly_fingerprint",
        "poly_fingerprint(text) - Rabin-Karp polynomial fingerprint mod 1e9+7"),
      (args: Seq[Expression]) => PolyFingerprint(args(0))),

    (FunctionIdentifier("band_hashes"),
      info("band_hashes",
        "band_hashes(signature, bands) - LSH band hashes over a minhash signature"),
      (args: Seq[Expression]) => BandHashes(args(0),
        intArg(args(1), "band_hashes", 2))),

    (FunctionIdentifier("sign_pack"),
      info("sign_pack",
        "sign_pack(vec) - 1-bit sign quantization: packed long words, bit i set iff vec[i] > 0"),
      (args: Seq[Expression]) => SignPack(args(0))),

    (FunctionIdentifier("sign_dot"),
      info("sign_dot",
        "sign_dot(query_vec, sign_words) - asymmetric binary dot: sum of +-query[i] by sign bit"),
      (args: Seq[Expression]) => SignDot(args(0), args(1))),

    (FunctionIdentifier("nfc_normalize"),
      info("nfc_normalize",
        "nfc_normalize(text) - Unicode NFC canonical composition (DuckDB-parity name)"),
      (args: Seq[Expression]) => NfcNormalize(args(0))),

    // these two resolve to COMPOSITIONS of codegen'd expressions (the
    // T26 chain / D15 string algebra) — registered by unwrapping the
    // Column-API builders, so SQL and Column users get the identical plan
    (FunctionIdentifier("normalize_text"),
      info("normalize_text",
        "normalize_text(text) - T26 canonical text normalization (NFC + invisibles/controls/whitespace)"),
      (args: Seq[Expression]) => NativeExpressions.normalizeTextExpr(args(0))),

    (FunctionIdentifier("canonicalize_url"),
      info("canonicalize_url",
        "canonicalize_url(url) - D15 canonical URL form (case/ports/www/fragment/tracking/param-sort/slash)"),
      (args: Seq[Expression]) => NativeExpressions.canonicalizeUrlExpr(args(0))),

    (FunctionIdentifier("text_profile"),
      info("text_profile",
        "text_profile(text) - T27 script profile: latin | joining | cjk | joining+cjk (presence-based)"),
      (args: Seq[Expression]) => NativeExpressions.textProfileExpr(args(0))),

    (FunctionIdentifier("normalize_text_ml"),
      info("normalize_text_ml",
        "normalize_text_ml(text) - T27 multilingual normalization (profile-switched invisibles + CJK width folding)"),
      (args: Seq[Expression]) => NativeExpressions.normalizeTextMlExpr(args(0))),

    // the one AGGREGATE on the surface: parses like any SQL aggregate
    // (GROUP BY-compatible) because the builder hands the analyzer a bare
    // AggregateFunction, which it wraps itself
    (FunctionIdentifier("misra_gries"),
      info("misra_gries",
        "misra_gries(key, capacity) - Misra-Gries heavy-hitter candidate keys"),
      (args: Seq[Expression]) => MisraGries(args(0),
        intArg(args(1), "misra_gries", 2)))
  )

  /** Register every graft SQL function on a live session. Idempotent. */
  def register(spark: SparkSession): Unit =
    definitions.foreach { case (id, fnInfo, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, fnInfo, builder)
    }
}
