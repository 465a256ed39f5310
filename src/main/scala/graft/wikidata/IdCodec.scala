package graft.wikidata

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Wikidata ID codec, re-expressed as Spark column arithmetic.
  *
  * Mirrors the reference encoding (reference: src/id.rs:6-24):
  *   Qn → n;  Pn → n + 1e9;  Ln → n + 2e9;
  *   Ln-Fm → l(n) + m*1e11;  Ln-Sm → l(n) + m*1e11 + 1e10.
  *
  * Everything here is pure int64 arithmetic on columns — it stays inside
  * WholeStageCodegen and costs nothing at 100 TB scale (no UDF, no shuffle).
  * The scalar variants exist for tests and driver-side convenience.
  */
object IdCodec {
  val PropertyOffset: Long = 1_000_000_000L
  val LexemeOffset: Long   = 2_000_000_000L
  val SenseOffset: Long    = 10_000_000_000L
  val SubIdFactor: Long    = 100_000_000_000L

  // ---- scalar (tests / driver-side) ----
  def qId(n: Long): Long                = n
  def pId(n: Long): Long                = n + PropertyOffset
  def lId(n: Long): Long                = n + LexemeOffset
  def fId(n: Long, form: Long): Long    = lId(n) + form * SubIdFactor
  def sId(n: Long, sense: Long): Long   = lId(n) + sense * SubIdFactor + SenseOffset

  /** Decode an encoded id back to (kind, num, sub): kind ∈ Q,P,L,F,S;
    * num = the entity/property/lexeme number; sub = form/sense number (0 otherwise). */
  def decode(id: Long): (String, Long, Long) =
    if (id >= SubIdFactor) {
      val sub = id / SubIdFactor
      val rem = id % SubIdFactor
      if (rem >= SenseOffset + LexemeOffset) ("S", rem - SenseOffset - LexemeOffset, sub)
      else ("F", rem - LexemeOffset, sub)
    } else if (id >= LexemeOffset) ("L", id - LexemeOffset, 0L)
    else if (id >= PropertyOffset) ("P", id - PropertyOffset, 0L)
    else ("Q", id, 0L)

  /** Parse a textual Wikidata id ("Q42", "P31", "L99", "L99-F2", "L99-S1"). */
  def encodeText(id: String): Option[Long] = {
    val s = id.trim
    if (s.isEmpty) None
    else
      try {
        s.charAt(0) match {
          case 'Q' | 'q' => Some(qId(s.substring(1).toLong))
          case 'P' | 'p' => Some(pId(s.substring(1).toLong))
          case 'L' | 'l' =>
            val dash = s.indexOf('-')
            if (dash < 0) Some(lId(s.substring(1).toLong))
            else {
              val lex = s.substring(1, dash).toLong
              val sub = s.substring(dash + 2).toLong
              s.charAt(dash + 1) match {
                case 'F' | 'f' => Some(fId(lex, sub))
                case 'S' | 's' => Some(sId(lex, sub))
                case _         => None
              }
            }
          case _ => None
        }
      } catch { case _: NumberFormatException => None }
  }

  // ---- columnar (codegen'd — the scale path) ----
  def qid(n: Column): Column = n.cast("long")
  def pid(n: Column): Column = n.cast("long") + PropertyOffset
  def lid(n: Column): Column = n.cast("long") + LexemeOffset
  def fid(n: Column, form: Column): Column  = lid(n) + form.cast("long") * SubIdFactor
  def sid(n: Column, sense: Column): Column = lid(n) + sense.cast("long") * SubIdFactor + SenseOffset

  /** Columnar encode of a textual id ("Q42" / "P31" / "L9-F2" / "L9-S1" → int64, else null).
    *
    * Single-pass native expression (IdEncodeText): the older when-chain
    * formulation referenced its input ~10 times, which was correct only as
    * long as a Generate node stopped CollapseProject from re-inlining the
    * staged input — in `meta` there is no such barrier and the collapse
    * re-walked the `$.id` variant extraction per reference (measured: meta
    * scan 4.1 s vs 1.9 s at 32 cores on the 231 MB dump). A native
    * expression references its child exactly once, so staging is no longer
    * a correctness-of-performance concern anywhere it's used.
    * Malformed ids → null, never a job failure — the reference skips bad
    * input per line (src/main.rs:206-215) and so must a 100 TB run. */
  def encodeTextCol(s: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      IdEncodeText(org.apache.spark.sql.graft.ColumnBridge.expression(s)))

  /** Sentinel-based primitive encode shared by IdEncodeText's interpreted
    * and codegen paths: Long.MinValue = malformed (never a valid id — all
    * encodings are small positive sums). Semantics mirror the SQL
    * formulation in `encodeTextColSql` exactly: number fields are parsed
    * with Spark's own ANSI cast-to-long (UTF8String.toLongExact — the
    * try_cast path: whitespace/ISO-control trim, optional sign, decimal
    * tails rejected) over at most 18 characters, the lexeme number comes
    * from before the FIRST dash, the sub-id from after the LAST. */
  val Invalid: Long = Long.MinValue
  def encodePrim(u: org.apache.spark.unsafe.types.UTF8String): Long = {
    import org.apache.spark.unsafe.types.UTF8String
    val n = u.numBytes()
    if (n < 1) return Invalid
    def upper(b: Byte): Int = if (b >= 'a' && b <= 'z') b - 32 else b.toInt
    // Cast-to-long of bytes [from, until) capped at 18 chars (the
    // substring(_, 2, 18) bound of the SQL formulation), DELEGATED to
    // Spark's own UTF8String.toLongExact — the ANSI try_cast path the SQL
    // formulation uses — so whitespace/ISO-control trimming, signs, and
    // decimal-tail REJECTION ("1.5" → null) match by construction rather
    // than by reimplementation (a hand parse diverged on "Q\t42", and the
    // legacy toLong would diverge the other way on "Q1.5").
    def num(from0: Int, until0: Int): Long = {
      val until = math.min(until0, from0 + 18)
      if (from0 >= until) return Invalid
      val len = until - from0
      val bytes = new Array[Byte](len)
      var i = 0
      while (i < len) { bytes(i) = u.getByte(from0 + i); i += 1 }
      try UTF8String.fromBytes(bytes).toLongExact
      catch { case _: NumberFormatException => Invalid }
    }
    var firstDash = -1
    var lastDash = -1
    var i = 0
    while (i < n) {
      if (u.getByte(i) == '-') { if (firstDash < 0) firstDash = i; lastDash = i }
      i += 1
    }
    upper(u.getByte(0)) match {
      case 'Q' =>
        val v = num(1, n); if (v == Invalid) Invalid else v
      case 'P' =>
        val v = num(1, n); if (v == Invalid) Invalid else v + PropertyOffset
      case 'L' if firstDash < 0 =>
        val v = num(1, n); if (v == Invalid) Invalid else v + LexemeOffset
      case 'L' =>
        val subStart = lastDash + 1
        if (subStart >= n) return Invalid
        val lex = num(1, firstDash)
        val sub = num(subStart + 1, n)
        if (lex == Invalid || sub == Invalid) Invalid
        else upper(u.getByte(subStart)) match {
          case 'F' => lex + LexemeOffset + sub * SubIdFactor
          case 'S' => lex + LexemeOffset + sub * SubIdFactor + SenseOffset
          case _   => Invalid
        }
      case _ => Invalid
    }
  }

  /** The original SQL-function formulation of `encodeTextCol`, kept as the
    * differential-test oracle for the native expression (IdCodecSpec
    * compares them input-by-input) and as documentation of the semantics
    * the DuckDB gate oracles re-derive. */
  def encodeTextColSql(s: Column): Column = {
    val prefix = upper(substring(s, 1, 1))
    val dash   = instr(s, "-")
    val simpleNum = substring(s, 2, 18).try_cast("long")
    val lexNum    = substring(substring_index(s, "-", 1), 2, 18).try_cast("long")
    val subKind   = upper(substring(substring_index(s, "-", -1), 1, 1))
    val subNum    = substring(substring_index(s, "-", -1), 2, 18).try_cast("long")
    when(prefix === "Q", simpleNum)
      .when(prefix === "P", simpleNum + PropertyOffset)
      .when(prefix === "L" && dash === 0, simpleNum + LexemeOffset)
      .when(prefix === "L" && subKind === "F", lexNum + LexemeOffset + subNum * SubIdFactor)
      .when(prefix === "L" && subKind === "S", lexNum + LexemeOffset + subNum * SubIdFactor + SenseOffset)
      .otherwise(lit(null).cast("long"))
  }

  /** Columnar decode → kind string ('Q','P','L','F','S'). */
  def kindCol(id: Column): Column = {
    val e = id.cast("long")
    when(e >= SubIdFactor, when(e % SubIdFactor >= SenseOffset + LexemeOffset, "S").otherwise("F"))
      .when(e >= LexemeOffset, "L")
      .when(e >= PropertyOffset, "P")
      .otherwise("Q")
  }

  /** Columnar decode → base number (entity/property/lexeme number). */
  def numCol(id: Column): Column = {
    val e   = id.cast("long")
    val rem = e % SubIdFactor
    when(e >= SubIdFactor, when(rem >= SenseOffset + LexemeOffset, rem - SenseOffset - LexemeOffset).otherwise(rem - LexemeOffset))
      .when(e >= LexemeOffset, e - LexemeOffset)
      .when(e >= PropertyOffset, e - PropertyOffset)
      .otherwise(e)
  }

  /** Columnar decode → form/sense sub-number (0 for plain Q/P/L ids).
    * `/` on longs is double division in Spark — cast back to long (values
    * are < 2^53 so the round-trip is exact, and positive so truncation = floor). */
  def subCol(id: Column): Column = {
    val e = id.cast("long")
    when(e >= SubIdFactor, (e / SubIdFactor).cast("long")).otherwise(lit(0L))
  }
}
