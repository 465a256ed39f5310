package graft.wikidata

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Wikidata JSON dump framing, distributed.
  *
  * The reference reads the dump line-by-line on one core, skipping the `[` /
  * `]` array delimiter lines, dropping a trailing comma per line, and
  * tolerating malformed lines (reference: src/main.rs:174-215). Here the same
  * framing is a `spark.read.text` scan — splittable, so a 100 TB dump fans
  * out across every executor — followed by codegen'd string cleanup and a
  * single `parse_json` into a VariantType column. Bad JSON becomes NULL
  * (`try_parse_json`) and is filtered, never fatal, matching the reference's
  * per-line error tolerance.
  */
object DumpReader {

  /** Raw dump lines → one VariantType column `entity`, malformed lines dropped. */
  def entities(lines: DataFrame): DataFrame = {
    val trimmed = trim(col("value"))
    lines
      .filter(trimmed =!= "" && trimmed =!= "[" && trimmed =!= "]")
      .select(try_parse_json(regexp_replace(trimmed, ",$", "")).as("entity"))
      .filter(col("entity").isNotNull)
  }

  /** Read a dump file (or directory of shards) into entity variants. */
  def read(spark: SparkSession, path: String): DataFrame =
    entities(spark.read.text(path))

  /** Parse an in-memory dataset of dump lines (tests, streaming sources). */
  def fromLines(spark: SparkSession, lines: Seq[String]): DataFrame = {
    import spark.implicits._
    entities(lines.toDF("value"))
  }
}
