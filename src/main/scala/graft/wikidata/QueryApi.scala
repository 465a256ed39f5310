package graft.wikidata

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The query surface the reference's SQLite database gives its users
  * (reference: README.md:103-156), as composable DataFrame operators.
  *
  * Everything returns a plan, not results — Catalyst fuses the filters into
  * scans and broadcasts the small claim sets, so a conjunctive search over
  * 100 TB of claims is N semi-joins against one fact scan, not N passes.
  */
final case class QueryApi(tables: WikidataTables) {

  /** `SELECT * FROM meta WHERE label = ?` (README.md:108). */
  def byLabel(label: String): DataFrame =
    tables.meta.filter(col("label") === label)

  /** Claims of one property with an entity value: `?item wdt:P462 wd:Q3142`. */
  def withEntityClaim(propertyId: Long, entityId: Long): DataFrame =
    tables.entity.filter(col("property_id") === propertyId && col("entity_id") === entityId)

  /** The "red fruits" query (README.md:129-131): entities satisfying ALL of
    * the given (property, entity-value) claims, with their labels.
    * Each conjunct is a LEFT SEMI join; the claim sets are usually tiny
    * relative to `meta`, so Catalyst broadcasts them.
    */
  def conjunctiveEntitySearch(conjuncts: Seq[(Long, Long)]): DataFrame =
    conjuncts.foldLeft(tables.meta) { case (acc, (pid, qid)) =>
      acc.join(
        withEntityClaim(pid, qid).select(col("id").as("match_id")),
        col("id") === col("match_id"), "left_semi")
    }

  /** `wdt:P279*` transitive closure over ONE property's entity edges:
    * every (id, ancestor_id) pair reachable through chained claims of
    * `propertyId` — the SPARQL `*` path the reference's single-step
    * conjunctive search (README.md:129-156) naturally grows into. The
    * entity table is filtered to the property FIRST, so the doubling runs
    * on the ontology-sized subgraph, never the full claim set; compose with
    * [[conjunctiveEntitySearch]] by semi-joining against the closure
    * (e.g. "instance of any subclass of Q"). O(log diameter) rounds —
    * see [[graft.operators.PropertyPath]].
    *
    * `reflexive = true` (default) is the SPARQL `*` semantics: zero-hop
    * (id, id) pairs for every node in the subgraph are included, so
    * "instance of any subclass of Q" keeps Q's DIRECT instances. Pass
    * false for strict `+` (>= 1 hop) reachability. */
  def pathClosure(propertyId: Long, reliable: Boolean = false,
      reflexive: Boolean = true): DataFrame = {
    val edges = tables.entity.filter(col("property_id") === propertyId)
      .select(col("id"), col("entity_id"))
    val plus = graft.operators.PropertyPath.closure(edges, reliable = reliable)
    if (!reflexive) plus
    else plus.unionByName(
      edges.select(col("id").cast("long").as("src"))
        .unionByName(edges.select(col("entity_id").cast("long").as("src")))
        .filter(col("src").isNotNull).distinct()
        .select(col("src"), col("src").as("dst")))
  }

  /** Composed property-path query (SPARQL 1.1 paths over the claim table):
    * `path("P31/P279*")` answers "instance of any subclass of" — the
    * reference README's own SPARQL comparison (README.md:146-152) — and the
    * full algebra (`/` sequence, `|` alternation, `^` inverse, `* + ?`
    * closures) composes from the same leaves. Each leaf filters the entity
    * claims to ONE property before any join or closure runs, so path
    * evaluation touches ontology-sized subgraphs, never the full claim set.
    * Returns (src, dst) pairs; see [[graft.operators.PathAlgebra]] for
    * zero-hop semantics. [[pathClosure]] remains the single-property
    * fast path (`path("P279*")` ≡ `pathClosure(279)`). */
  def path(expr: String, reliable: Boolean = false): DataFrame =
    graft.operators.PathAlgebra.eval(
      // the expression's human numbers (P279) address the STORED encoded
      // ids (1000000279) — mapPids covers Prop and NegatedSet both, where
      // encoding only inside edgesOf would leave negated-set filters
      // comparing raw numbers against encoded columns and match nothing
      graft.operators.PathAlgebra.mapPids(
        graft.operators.PathAlgebra.parse(expr), IdCodec.pId),
      pid => tables.entity.filter(col("property_id") === pid)
        .select(col("id"), col("entity_id")),
      reliable = reliable,
      // negated sets (`!(P31|^P279)`, W30) read the full claim frame with
      // the pid ∉ set filter pushed to the scan
      allEdges = () => tables.entity
        .select(col("property_id"), col("id"), col("entity_id")))

  /** Entities whose textual id matches, e.g. byId("Q42"). */
  def byId(textId: String): DataFrame = {
    val encoded = IdCodec.encodeText(textId)
      .getOrElse(throw new IllegalArgumentException(s"bad Wikidata id: $textId"))
    tables.meta.filter(col("id") === encoded)
  }

  /** All claims of an entity across the typed tables, unioned into a long
    * (id, property_id, value_kind, value_text) view — the "SELECT * across
    * tables" exploration pattern from the README example. */
  def claimsOf(entityId: Long): DataFrame = {
    def slim(df: DataFrame, kind: String, value: Column): DataFrame =
      df.filter(col("id") === entityId)
        .select(col("id"), col("property_id"), lit(kind).as("value_kind"),
          value.cast("string").as("value_text"))
    slim(tables.string, "string", col("string"))
      .unionAll(slim(tables.entity, "entity", col("entity_id")))
      .unionAll(slim(tables.coordinates, "coordinates",
        concat_ws(",", col("latitude"), col("longitude"))))
      .unionAll(slim(tables.quantity, "quantity", col("amount")))
      .unionAll(slim(tables.time, "time", col("time")))
      .unionAll(slim(tables.none, "none", lit(null)))
      .unionAll(slim(tables.unknown, "unknown", lit(null)))
  }
  /** W32: typo-tolerant label lookup — meta rows whose English label is
    * within Levenshtein distance 1 of `term`: the query a SQLite user
    * approximates with LIKE and gets wrong (LIKE can't rank or bound
    * edits). The term's |term|+1 deletion variants probe D16's variant
    * index as hash keys — persist the index sorted on `__h` and this is a
    * handful of pushed-down point reads, never a label scan — then the
    * exact codegen'd levenshtein verifies candidates only. See
    * [[graft.operators.EditJoin]]. */
  def byLabelFuzzy(term: String): DataFrame = {
    val labels = tables.meta.filter(col("label").isNotNull)
    graft.operators.EditJoin.fuzzyLookup(
      graft.operators.EditJoin.variantIndex(labels, "id", "label"),
      labels, "id", "label", term)
  }

  /** W53/W56 name universe: English labels ∪ every language's aliases as
    * ONE (id, name) frame — the lookup surface users actually mean by
    * "the entity called X" ("Douglas Noël Adams", "DNA" and the label all
    * resolve). Needs the links surface ([[WikidataEtl.runFull]] /
    * [[DumpReader.readFull]]); throws loudly otherwise. */
  private var anyNamesMemo: Option[DataFrame] = None

  def anyNames: DataFrame = synchronized {
    val aliases = tables.aliases.getOrElse(throw new IllegalArgumentException(
      "any-name lookup needs the links surface: parse with DumpReader.readFull/" +
        "readLinks and run WikidataEtl.runFull (W52 aliases)"))
    // Caches-owned: one QueryApi instance typically feeds the name universe
    // to several actions (probe-term agg, index save, lookup verify) — the
    // (id, name) frame is rows-of-names small, while its lineage is the
    // full-surface parse; unpinned, that parse re-ran per consumer
    // (measured: the w56/w57 gates evaluated it 3-6x). Released by
    // Caches.releaseAll between gates/specs like every operator cache —
    // and RE-OWNED on the next access if this instance outlives a release
    // cycle (a lazy val would silently hand the unpersisted frame to every
    // later consumer, re-running the full-surface parse per action again).
    anyNamesMemo
      .filter(_.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
      .getOrElse {
        val f = graft.operators.Caches.owned(
          QueryApi.anyNamesOf(tables.meta, aliases))
        anyNamesMemo = Some(f)
        f
      }
  }

  /** W56: typo-tolerant ANY-name lookup — [[byLabelFuzzy]] over the
    * [[anyNames]] universe: rows within Levenshtein 1 of `term` whether
    * the near-match is the label or any alias in any language. Same
    * FastSS deletion-variant probe + exact verify as W32; the alias rows
    * simply widen the indexed universe. */
  def byAnyNameFuzzy(term: String): DataFrame = {
    val names = anyNames
    graft.operators.EditJoin.fuzzyLookup(
      graft.operators.EditJoin.variantIndex(names, "id", "name"),
      names, "id", "name", term)
  }

  /** W56: persist the any-name variant index as a W33-style range-clustered
    * snapshot table — a stored fuzzy ANY-name lookup is then at most
    * |term|+1 footer-pruned point reads whatever the corpus size
    * ([[graft.operators.EditJoin.saveIndex]] owns the clustering contract;
    * [[graft.operators.EditJoin.appendIndexDelta]] maintains it under
    * label/alias churn exactly as W36 does for labels). */
  def saveAnyNameIndex(spark: org.apache.spark.sql.SparkSession, table: String,
      files: Int = 64): Long =
    graft.operators.EditJoin.saveIndex(spark, table, anyNames, "id", "name", files)

  /** W62: [[conjunctiveEntitySearch]] under a PROVENANCE requirement —
    * every conjunct must be satisfied by a claim carrying at least one
    * reference record (W59): "red fruits, according to some source". The
    * skeptical form of the reference README's own query pattern, which
    * its users cannot ask because the reference drops references with the
    * qualifiers. Each conjunct filters the entity-valued claim spine to
    * (pid, qid) FIRST (tiny), semi-joins the sourced claim-id set (also
    * claim-keyed), and the surviving per-conjunct id sets chain as LEFT
    * SEMI joins against meta — all broadcast-scale, the W15 shape with
    * one extra claim-keyed cut. Needs the full surface
    * ([[WikidataEtl.runFull]]); throws loudly otherwise. */
  def conjunctiveSourcedSearch(conjuncts: Seq[(Long, Long)]): DataFrame = {
    val spine = tables.statements.getOrElse(throw new IllegalArgumentException(
      "sourced search needs the claim spine: run WikidataEtl.runQualified/runFull"))
    val refs = tables.references.getOrElse(throw new IllegalArgumentException(
      "sourced search needs the references surface: run WikidataEtl.runFull (W59)"))
    val sourcedIds = refs.select("claim_id").distinct()
    conjuncts.foldLeft(tables.meta) { case (acc, (pid, qid)) =>
      val sourcedClaim = spine
        .filter(col("property_id") === pid && col("entity_id") === qid)
        .join(sourcedIds, Seq("claim_id"), "left_semi")
        .select(col("id").as("match_id"))
      acc.join(sourcedClaim, col("id") === col("match_id"), "left_semi")
    }
  }

  /** W56: [[byAnyNameFuzzy]] against a [[saveAnyNameIndex]] store. */
  def byAnyNameFuzzyStored(spark: org.apache.spark.sql.SparkSession,
      table: String, term: String): DataFrame =
    graft.operators.EditJoin.fuzzyLookupStored(spark, table, anyNames, "id", "name", term)
}

object QueryApi {
  /** The W53/W56 name universe from bare frames — callers holding
    * published tables (snapshot reads, X30's streaming maintenance)
    * rather than a [[WikidataTables]]. */
  def anyNamesOf(meta: DataFrame, aliases: DataFrame): DataFrame =
    meta.filter(col("label").isNotNull)
      .select(col("id"), col("label").as("name"))
      .unionAll(aliases.select(col("id"), col("alias").as("name")))
      .distinct()
}
