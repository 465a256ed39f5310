package graft.wikidata

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** W35: temporal claim validity — the query qualifiers exist for.
  *
  * Wikidata models "France's capital was X from 1682 to 1789" as a claim
  * qualified with P580 (start time) / P582 (end time). The reference drops
  * qualifiers (src/value.rs keeps the mainsnak only), so its SQLite users
  * cannot ask "what was true at time T" at all — every temporal statement
  * collapses to an eternal one. With the W34 qualifier table the question is
  * one aggregation and one join, both claim-keyed.
  *
  * Validity law (documented, gate-pinned): a claim is valid at T iff
  * `min(P580) <= T` (or it has no P580) AND `max(P582) > T` (or no P582).
  * min/max because a statement may carry several start/end qualifiers
  * (Wikidata allows it; the mini-dump plants it): the widest stated span
  * wins, which is the reading that never hides a claim an editor asserted
  * was in force.
  */
object TemporalClaims {

  /** Encoded qualifier property ids: P580 = start time, P582 = end time. */
  val StartPid: Long = IdCodec.encodeText("P580").get
  val EndPid: Long   = IdCodec.encodeText("P582").get

  /** Per-claim validity span from the qualifier table: (claim_id,
    * valid_from, valid_until), one row per claim that carries at least one
    * start/end time qualifier. The aggregation is claim-keyed — a shuffle of
    * just the temporal qualifier rows (a sliver of the qualifier table,
    * itself a sliver of claims), with the pid filter pushed to the scan. */
  def validitySpans(qualifiers: DataFrame): DataFrame =
    qualifiers
      .filter(col("kind") === "time" &&
        col("qual_property_id").isin(StartPid, EndPid))
      .groupBy("claim_id")
      .agg(
        min(when(col("qual_property_id") === StartPid, col("time"))).as("valid_from"),
        max(when(col("qual_property_id") === EndPid, col("time"))).as("valid_until"))

  /** Filter `statements` (any frame with a `claim_id` column — e.g.
    * [[WikidataEtl.entityStatements]]) to the claims valid at `at`.
    * Unqualified claims (no span row, or a null claim_id from a dump
    * without statement ids) are eternal — they always survive, which is
    * exactly the reference's implicit semantics for every claim. The span
    * frame is span-count-sized, so Catalyst broadcasts it under any
    * realistic stats; claims flow through unshuffled. */
  def validAt(statements: DataFrame, qualifiers: DataFrame, at: Column): DataFrame = {
    val spans = validitySpans(qualifiers)
      .withColumnRenamed("claim_id", "__span_claim_id")
    statements
      .join(spans, col("claim_id") === col("__span_claim_id"), "left_outer")
      .filter(
        (col("valid_from").isNull || col("valid_from") <= at) &&
          (col("valid_until").isNull || col("valid_until") > at))
      .drop("__span_claim_id", "valid_from", "valid_until")
  }

  /** W45: conjunctive claim search AS OF `at` — the reference README's
    * own "red fruits" pattern (W15) with every conjunct evaluated over
    * the claims in force at T: ids satisfying claim A AND claim B *at
    * that time*. Same scale shape as W15 — chained LEFT SEMI joins,
    * Catalyst broadcasts the small per-conjunct claim sets — with ONE
    * validAt pass shared by all conjuncts. */
  def conjunctiveSearchAt(statements: DataFrame, qualifiers: DataFrame,
      conjuncts: Seq[(Long, Long)], at: Column): DataFrame = {
    require(conjuncts.nonEmpty, "need at least one (property, entity) conjunct")
    val alive = validAt(statements, qualifiers, at)
    conjuncts.map { case (pid, target) =>
      alive.filter(col("property_id") === pid && col("entity_id") === target)
        .select("id")
    }.reduce((a, b) => a.join(b, Seq("id"), "left_semi")).distinct()
  }

  /** W44: per-property temporal coverage — the audit a temporal-query
    * user runs FIRST, because validAt is only as good as the qualifiers
    * behind it: for each property of the statement spine, how many claims
    * exist, how many carry any validity span, and the stated time range.
    * One span join + one property-keyed aggregate with map-side partials;
    * the answer is property-count-sized. */
  def temporalCoverage(statements: DataFrame, qualifiers: DataFrame): DataFrame = {
    val spans = validitySpans(qualifiers)
      .withColumnRenamed("claim_id", "__span_claim_id")
    statements
      .join(spans, col("claim_id") === col("__span_claim_id"), "left_outer")
      .groupBy("property_id")
      .agg(
        count(lit(1)).as("n_claims"),
        count(col("__span_claim_id")).as("n_temporal"),
        min(col("valid_from")).as("earliest_from"),
        max(col("valid_until")).as("latest_until"))
  }

  /** W42: the temporal DIFF — claims whose in-force status FLIPPED
    * between `t1` and `t2` ("what changed in the ontology this decade"),
    * tagged `gained` (in force at t2 only) or `lost` (t1 only). One span
    * aggregation and one join, claim-keyed like [[validAt]]; claims alive
    * or dead at BOTH times never survive the filter, so the answer is
    * churn-sized. Eternal (unqualified) claims can never appear — both
    * flags are true. */
  def changedBetween(statements: DataFrame, qualifiers: DataFrame,
      t1: Column, t2: Column): DataFrame = {
    val spans = validitySpans(qualifiers)
      .withColumnRenamed("claim_id", "__span_claim_id")
    def alive(at: Column) =
      (col("valid_from").isNull || col("valid_from") <= at) &&
        (col("valid_until").isNull || col("valid_until") > at)
    statements
      .join(spans, col("claim_id") === col("__span_claim_id"), "left_outer")
      .withColumn("__a1", alive(t1)).withColumn("__a2", alive(t2))
      .filter(col("__a1") =!= col("__a2"))
      .withColumn("change", when(col("__a2"), "gained").otherwise("lost"))
      .drop("__span_claim_id", "valid_from", "valid_until", "__a1", "__a2")
  }

  /** W41: the W21 path algebra evaluated over the graph AS OF `at` —
    * `pathAt("P31/P279*", …, T)` answers "instances of any subclass of X,
    * as the ontology stood at T". One validAt pass filters the statement
    * spine; every algebra leaf then reads its property's slice of the
    * SAME alive frame, so the temporal filter costs one span join however
    * many properties the expression touches, and the algebra's scale
    * shape (leaf-filtered edges, id-pair shuffles, log-round closures) is
    * untouched. Property numbers in `expr` are ENCODED onto the stored id
    * space (P279 → 1000000279) exactly as in `QueryApi.path` — the
    * statements frame is this package's spine, so its `property_id` is
    * always the encoded form. */
  def pathAt(expr: String, statements: DataFrame, qualifiers: DataFrame,
      at: Column, reliable: Boolean = false): DataFrame = {
    val alive = validAt(statements, qualifiers, at)
    graft.operators.PathAlgebra.eval(
      graft.operators.PathAlgebra.mapPids(
        graft.operators.PathAlgebra.parse(expr), IdCodec.pId),
      pid => alive.filter(col("property_id") === pid)
        .select(col("id"), col("entity_id")),
      reliable = reliable,
      allEdges = () => alive
        .select(col("property_id"), col("id"), col("entity_id")))
  }

  /** W37: the question a human actually asks — "what was true at T", in
    * words: [[validAt]]'s surviving entity-valued claims decorated with
    * both endpoints' English labels from the meta table (left joins —
    * unlabeled entities stay, the reference's meta NULL semantics). Two
    * id-keyed joins against meta; at full-corpus scale both sides shuffle
    * on id once, and the claim frame was already filtered to the claims
    * alive at T, so the joins are priced by the ANSWER, not the corpus. */
  def labeledAt(statements: DataFrame, qualifiers: DataFrame, meta: DataFrame,
      at: Column): DataFrame = {
    val subj = meta.select(col("id"), col("label").as("subject_label"))
    val obj = meta.select(col("id").as("__oid"), col("label").as("object_label"))
    validAt(statements, qualifiers, at)
      .join(subj, Seq("id"), "left_outer")
      .join(obj, col("entity_id") === col("__oid"), "left_outer")
      .select(col("claim_id"), col("id"), col("subject_label"),
        col("property_id"), col("entity_id"), col("object_label"))
  }
}
