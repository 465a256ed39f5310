package graft.wikidata

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incremental Wikidata ingestion (SURVEY.md §2.1 W22): apply an
  * entity-revision changeset to the 8 published tables instead of rebuilding
  * them from a full dump.
  *
  * The reference refuses to update an existing output file and rebuilds from
  * scratch every run (reference: src/main.rs:98-104). At 100 TB a full
  * rebuild is days of cluster time, while the daily diff is ~1e-2 of the
  * corpus — so the incremental path is the only viable refresh. The apply
  * is the CDC shape [[graft.operators.Upsert]] establishes, lifted to
  * entity grain: the changeset's entity ids are the merge keys, and each
  * table's delta is delete-all-rows-of-touched-entities then append the
  * re-derived rows — an entity's claims are replaced wholesale, exactly
  * what a new revision means.
  *
  * Semantics: last-writer-wins by `lastrevid` (the dump's revision counter),
  * NOT file order — changesets assembled from parallel fetches carry
  * revisions out of order. Deletion markers (`"deleted": true`) compete on
  * the same axis, so delete-then-recreate and stale-put-after-delete both
  * resolve correctly; on a revid tie the delete wins (conservative: a
  * re-fetch can resurrect, a leaked row cannot un-ship).
  *
  * Scale shape: the winners frame is changeset-bounded, so every per-table
  * anti-join broadcasts the touched-id set — eight map-only passes over the
  * base tables, zero shuffles of base data. Pair with
  * [[graft.operators.SnapshotTable]] (see [[applyCommit]]) for atomic
  * publication: readers see the old tables until the new version's manifest
  * lands, and a crashed apply leaves the old version current.
  */
object IncrementalEtl {

  /** The 8 published table names, in [[WikidataTables.byName]] key order
    * contract. */
  val tableNames: Seq[String] = Seq("meta", "string", "entity", "coordinates",
    "quantity", "time", "none", "unknown")

  /** W40: the 10-table surface — the qualified run's extra tables merge by
    * the identical delete-then-append law (both are id-keyed like every
    * claim table). */
  val tableNamesQualified: Seq[String] = tableNames ++ Seq("qualifiers", "statements")

  /** W55: the complete 13-table surface (W54's run) — sitelinks, aliases
    * and the W59 reference table are id-keyed too, so the same law covers
    * them. */
  val tableNamesFull: Seq[String] =
    tableNamesQualified ++ Seq("sitelinks", "aliases", "references")

  /** Changeset entity schema: the pruned dump entity plus revision metadata.
    * A deletion marker carries only (id, lastrevid, deleted). */
  val changeSchema: StructType = StructType(
    DumpReader.entitySchema.fields ++ Seq(
      StructField("lastrevid", LongType),
      StructField("deleted", BooleanType)))

  /** W40: the qualified changeset schema (statement ids + qualifier snaks
    * retained on every revision's claims). */
  val changeSchemaQualified: StructType = StructType(
    DumpReader.entitySchemaQualified.fields ++ Seq(
      StructField("lastrevid", LongType),
      StructField("deleted", BooleanType)))

  /** W55: the full changeset schema (qualified + sitelinks + aliases). */
  val changeSchemaFull: StructType = StructType(
    DumpReader.entitySchemaFull.fields ++ Seq(
      StructField("lastrevid", LongType),
      StructField("deleted", BooleanType)))

  /** Changeset lines → one struct column `c`, with the dump framing rules of
    * [[DumpReader.entities]] (skip brackets/blank/junk, strip trailing
    * commas, malformed → dropped). */
  def changesFrom(lines: DataFrame,
      schema: StructType = changeSchema): DataFrame = {
    val trimmed = trim(col("value"))
    lines
      .filter(trimmed =!= "" && trimmed =!= "[" && trimmed =!= "]")
      .select(from_json(regexp_replace(trimmed, ",$", ""), schema).as("c"))
      .filter(col("c").isNotNull && col("c.id").isNotNull)
  }

  /** Read a changeset file (or directory of shards). */
  def readChangeset(spark: SparkSession, path: String,
      qualified: Boolean = false, full: Boolean = false): DataFrame =
    changesFrom(spark.read.text(path),
      if (full) changeSchemaFull
      else if (qualified) changeSchemaQualified
      else changeSchema)

  /** LWW winners: one row per encoded entity id — the max-`lastrevid`
    * revision, deletes outranking puts on a tie. One partial-agg `max_by`
    * (map-side combine), no window sort: at daily-diff scale the changeset
    * is millions of rows and this is a single small shuffle. */
  def winners(changes: DataFrame): DataFrame =
    changes
      .select(IdCodec.encodeTextCol(col("c.id")).as("id"), col("c"))
      .filter(col("id").isNotNull)
      .groupBy("id")
      .agg(max_by(col("c"), struct(
        coalesce(col("c.lastrevid"), lit(0L)).as("rv"),
        coalesce(col("c.deleted"), lit(false)).cast("int").as("del"))).as("c"))

  /** Apply a changeset to base tables (keyed by [[WikidataTables.byName]]
    * names). Returns the next version of all 8 frames; call `unpersist()`
    * on the result once sinks are done (the delta core is cached, as in the
    * full ETL). */
  def applyChangeset(base: Map[String, DataFrame], changes: DataFrame,
      qualified: Boolean = false, full: Boolean = false): WikidataTables =
    applyWinners(base, winners(changes), qualified, full)

  /** Apply an already-resolved winners frame (`id`, `c`) — one row per
    * entity — to base tables. Split out so the streaming path
    * ([[graft.streaming.IncrementalEtlStream]]) can interpose its
    * cross-batch revision guard between [[winners]] and the merge. */
  def applyWinners(base: Map[String, DataFrame], win: DataFrame,
      qualified: Boolean = false, full: Boolean = false): WikidataTables = {
    // surviving revisions, reshaped to DumpReader's pruned entity struct so
    // the delta tables come from the SAME routing code as a full rebuild —
    // incremental and full cannot drift. The full (W55) shape carries the
    // links fields through; full implies the qualified tables too.
    val extraFields =
      if (full) Seq(col("c.aliases").as("aliases"),
        col("c.sitelinks").as("sitelinks"))
      else Seq.empty
    val survivors = win
      .filter(!coalesce(col("c.deleted"), lit(false)))
      .select(struct(Seq(
        col("c.id").as("id"),
        col("c.labels").as("labels"),
        col("c.descriptions").as("descriptions"),
        col("c.claims").as("claims")) ++ extraFields: _*).as("entity"))
    val delta =
      if (full) WikidataEtl.runFull(survivors, cache = true)
      else if (qualified) WikidataEtl.runQualified(survivors, cache = true)
      else WikidataEtl.run(survivors, cache = true)
    val touched = win.select("id")
    def merged(name: String): DataFrame =
      base(name)
        .join(broadcast(touched), Seq("id"), "left_anti")
        .unionByName(delta.byName(name))
    WikidataTables(
      meta = merged("meta"),
      string = merged("string"),
      entity = merged("entity"),
      coordinates = merged("coordinates"),
      quantity = merged("quantity"),
      time = merged("time"),
      none = merged("none"),
      unknown = merged("unknown"),
      core = delta.core,
      qualifiers = if (qualified || full) Some(merged("qualifiers")) else None,
      statements = if (qualified || full) Some(merged("statements")) else None,
      sitelinks = if (full) Some(merged("sitelinks")) else None,
      aliases = if (full) Some(merged("aliases")) else None,
      references = if (full) Some(merged("references")) else None)
  }

  /** File-level apply: parquet tables at `baseDir` + changeset dump at
    * `changesetPath` → next-version frames. */
  def applyFile(spark: SparkSession, baseDir: String, changesetPath: String,
      qualified: Boolean = false, full: Boolean = false): WikidataTables = {
    val names = if (full) tableNamesFull
      else if (qualified) tableNamesQualified else tableNames
    val base = names.map(n => n -> spark.read.parquet(s"$baseDir/$n")).toMap
    applyChangeset(base,
      readChangeset(spark, changesetPath, qualified, full), qualified, full)
  }

  /** Atomic refresh: apply the changeset and commit each table as the next
    * [[graft.operators.SnapshotTable]] version. Readers on the previous
    * version are unaffected (snapshot isolation); a crash mid-apply leaves
    * every table at its old version — the manifest rename is the only
    * publication point. Returns the committed version per table. */
  def applyCommit(spark: SparkSession, base: Map[String, DataFrame],
      changes: DataFrame, tableRoot: String): Map[String, Long] = {
    val next = applyChangeset(base, changes)
    try next.byName.map { case (name, df) =>
      name -> graft.operators.SnapshotTable.commit(spark, s"$tableRoot/$name", df)
    } finally next.unpersist()
  }
}
