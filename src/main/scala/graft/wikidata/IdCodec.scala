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
    * try_cast, not cast: under ANSI mode a malformed id would otherwise
    * fail the whole job — the reference skips bad input per line
    * (src/main.rs:206-215) and so must a 100 TB run. */
  def encodeTextCol(s: Column): Column = {
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
