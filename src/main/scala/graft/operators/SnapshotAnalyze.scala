package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** R60: ANALYZE — table/column statistics for [[SnapshotTable]]s, the
  * surface every table format ships (Delta `ANALYZE TABLE`, Iceberg
  * `compute stats`): per-column row/null counts, NDV, and min/max for a
  * PINNED version, persisted as a sidecar so planners and humans read
  * them with zero data I/O.
  *
  * Two NDV modes, because the honest answer differs by purpose:
  * `exact = false` (default, the 100 TB path) uses Spark's HLL++
  * (`approx_count_distinct`, one shuffle-free partial-merge pass, error
  * ~rsd); `exact = true` adds `count(DISTINCT c)` — an EXPAND shuffle,
  * affordable at gate scale and the yardstick the r60 gate uses to bound
  * the sketch in-plan. Sketch mode computes in ONE aggregate over one
  * scan however many columns are profiled; exact mode runs the
  * multi-distinct as a SECOND aggregate (crossJoined 1×1), because
  * dragging the HLL imperative buffers through the distinct Expand
  * forces the sort-based aggregate path — measured ~15× slower than the
  * two passes combined.
  *
  * Persistence: `<table>/_analyze/v<version>.json` — written atomically
  * (tmp + move), immutable once present, outside `data/` so vacuum never
  * touches it; [[readProfile]] rebuilds the exact frame from the sidecar
  * without reading a data byte. Complements R42's per-FILE min/max
  * sidecars (skipping) with TABLE-level semantics (CBO inputs: join-side
  * size/NDV, null ratios, range width).
  */
object SnapshotAnalyze {

  /** Per-column profile of `cols` at `version` (latest when -1): one row
    * per column — (column, n_rows, n_nulls, n_distinct, min_str, max_str).
    * `n_distinct` is the HLL estimate unless `exact`; with `exact` the
    * frame also carries `ndv_est` (the sketch) so callers can bound it. */
  def profile(spark: SparkSession, table: String, cols: Seq[String],
      version: Long = -1L, exact: Boolean = false, rsd: Double = 0.02): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val df = SnapshotTable.read(spark, table, version)
    val basicAggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__cnt_$c"),
        approx_count_distinct(col(c), rsd).as(s"__hll_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val basic = df.agg(count(lit(1)).as("__n"), basicAggs: _*)
    // exact NDVs run as their OWN aggregate: a multi-distinct plan is an
    // Expand (x #distinct-groups+1), and dragging the HLL imperative
    // buffers through that Expand forces the whole thing onto the
    // sort-based path — measured ~15x slower than the two passes combined
    val one = if (!exact) basic
      else basic.crossJoin(
        df.agg(countDistinct(col(cols.head)).as(s"__ndv_${cols.head}"),
          cols.tail.map(c => countDistinct(col(c)).as(s"__ndv_$c")): _*))
    val perCol = cols.map { c =>
      val fields = Seq(lit(c).as("column"), col("__n").as("n_rows"),
        (col("__n") - col(s"__cnt_$c")).as("n_nulls"),
        (if (exact) col(s"__ndv_$c") else col(s"__hll_$c")).as("n_distinct"),
        col(s"__min_$c").as("min_str"), col(s"__max_$c").as("max_str")) ++
        (if (exact) Seq(col(s"__hll_$c").as("ndv_est")) else Nil)
      struct(fields: _*)
    }
    one.select(explode(array(perCol: _*)).as("s")).select(col("s.*"))
      .orderBy("column")
  }

  private def sidecar(table: String, version: Long) =
    Paths.get(table, "_analyze", f"v$version%016d.json")

  /** Compute (sketch NDV) and persist the profile for `version` (latest
    * when -1). Idempotent: an existing sidecar wins (stats of an immutable
    * version are immutable). Returns the profiled version. */
  def analyze(spark: SparkSession, table: String, cols: Seq[String],
      version: Long = -1L): Long = {
    val v = if (version >= 0) version
      else SnapshotTable.latestVersion(table).getOrElse(
        throw new IllegalArgumentException(s"no versions in $table"))
    val out = sidecar(table, v)
    if (Files.exists(out)) return v
    val rows = profile(spark, table, cols, v).collect()
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val arr = mapper.createArrayNode()
    rows.foreach { r =>
      val o = mapper.createObjectNode()
      o.put("column", r.getString(0)); o.put("n_rows", r.getLong(1))
      o.put("n_nulls", r.getLong(2)); o.put("n_distinct", r.getLong(3))
      if (r.isNullAt(4)) o.putNull("min_str") else o.put("min_str", r.getString(4))
      if (r.isNullAt(5)) o.putNull("max_str") else o.put("max_str", r.getString(5))
      arr.add(o)
    }
    Files.createDirectories(out.getParent)
    val tmp = out.getParent.resolve(s".tmp-${java.util.UUID.randomUUID()}.json")
    Files.write(tmp, mapper.writeValueAsBytes(arr))
    try Files.move(tmp, out, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    catch { case _: java.nio.file.FileAlreadyExistsException => Files.deleteIfExists(tmp) }
    v
  }

  /** The persisted profile of `version` as a frame — metadata-only, zero
    * data I/O; None when that version was never analyzed. */
  def readProfile(spark: SparkSession, table: String,
      version: Long = -1L): Option[DataFrame] = {
    val v = if (version >= 0) version
      else SnapshotTable.latestVersion(table).getOrElse(return None)
    val p = sidecar(table, v)
    if (!Files.exists(p)) return None
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val arr = mapper.readTree(Files.readAllBytes(p))
    import scala.jdk.CollectionConverters._
    val rows = arr.elements().asScala.map { o =>
      (o.get("column").asText(), o.get("n_rows").asLong(),
        o.get("n_nulls").asLong(), o.get("n_distinct").asLong(),
        if (o.get("min_str").isNull) null else o.get("min_str").asText(),
        if (o.get("max_str").isNull) null else o.get("max_str").asText())
    }.toSeq
    import spark.implicits._
    Some(rows.toDF("column", "n_rows", "n_nulls", "n_distinct",
      "min_str", "max_str").orderBy("column"))
  }

  // ---- R62: MERGEABLE profiles — incremental ANALYZE under appends ----
  //
  // R60 re-scans the whole pinned version per ANALYZE; at 100 TB with a
  // streaming Append arriving every few minutes that is a full-table pass
  // per commit for statistics that changed by one shard. The fix is the
  // one every format converged on (Iceberg's puffin NDV sketches, Delta's
  // incremental stats): persist MERGEABLE per-column state — counts and
  // min/max merge trivially, NDV as a DataSketches HLL sketch whose union
  // is lossless — and fold in ONLY the new files of an append-like commit.
  // Append detection is structural, not mode-trusted: a commit is
  // incremental-eligible iff its file set strictly contains the parent's
  // (true for Append, false for Overwrite/Replace/compaction, which get a
  // full recompute). Merge cost is priced by the DELTA; the sketch makes
  // the union exact-in-distribution, not an approximation of one.

  private def msidecar(table: String, version: Long) =
    Paths.get(table, "_analyze", f"m$version%016d.json")

  /** hll_sketch_agg accepts int/long/string/binary; everything else rides
    * its canonical string rendering (NDV-preserving: the cast is injective
    * on a column's value domain). */
  private def sketchable(df: DataFrame, c: String): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.types._
    df.schema(c).dataType match {
      case IntegerType | LongType | StringType | BinaryType => col(c)
      case _ => col(c).cast("string")
    }
  }

  private case class MCol(column: String, dtype: String, nRows: Long,
      nNulls: Long, minStr: String, maxStr: String, sketch: Array[Byte])

  /** One aggregate pass over `df`: per column (rows, nulls, typed min/max
    * as strings, HLL sketch bytes). */
  private def mprofile(df: DataFrame, cols: Seq[String]): Seq[MCol] = {
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__cnt_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"),
        hll_sketch_agg(sketchable(df, c)).as(s"__sk_$c"))
    }
    val r = df.agg(count(lit(1)).as("__n"), aggs: _*).collect().head
    val n = r.getAs[Long]("__n")
    cols.map(c => MCol(c, df.schema(c).dataType.sql, n,
      n - r.getAs[Long](s"__cnt_$c"),
      r.getAs[String](s"__min_$c"), r.getAs[String](s"__max_$c"),
      r.getAs[Array[Byte]](s"__sk_$c")))
  }

  /** Merge two mergeable states: counts add, min/max compare in the
    * column's OWN type (string storage, typed semantics — "9" vs "10"
    * must compare numerically for a bigint column), sketches union
    * losslessly. All columns merge in ONE local projection over
    * `range(1)` — no job, no scan. */
  private def mergeStates(spark: SparkSession, a: Seq[MCol],
      b: Seq[MCol]): Seq[MCol] = {
    val bByCol = b.map(m => m.column -> m).toMap
    val exprs = a.flatMap { am =>
      val bm = bByCol(am.column)
      def typedExtreme(f: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column,
          x: String, y: String) =
        f(lit(x).cast(am.dtype), lit(y).cast(am.dtype)).cast("string")
      // an all-null slice has no sketch (hll_sketch_agg yields null):
      // union degenerates to the other side
      val sk =
        if (am.sketch == null) lit(bm.sketch)
        else if (bm.sketch == null) lit(am.sketch)
        else hll_union(lit(am.sketch), lit(bm.sketch), allowDifferentLgConfigK = true)
      Seq(
        typedExtreme(least(_, _), am.minStr, bm.minStr).as(s"__min_${am.column}"),
        typedExtreme(greatest(_, _), am.maxStr, bm.maxStr).as(s"__max_${am.column}"),
        sk.as(s"__sk_${am.column}"))
    }
    val r = spark.range(1).select(exprs: _*).collect().head
    a.map { am =>
      val bm = bByCol(am.column)
      MCol(am.column, am.dtype, am.nRows + bm.nRows, am.nNulls + bm.nNulls,
        r.getAs[String](s"__min_${am.column}"),
        r.getAs[String](s"__max_${am.column}"),
        r.getAs[Array[Byte]](s"__sk_${am.column}"))
    }
  }

  /** Compute-or-fold the mergeable profile of `version` (latest when -1)
    * and persist it to `_analyze/m<version>.json` (atomic, immutable,
    * vacuum-safe — the R60 discipline). Returns (version, incremental):
    * incremental=true means only the files ADDED since the parent version
    * were scanned and folded into the parent's persisted state; false
    * means a full recompute (first analyze, non-append commit, or a
    * parent that was never mergeably analyzed). Either path persists the
    * same shape, so every analyzed version is a future fold base. */
  def analyzeMergeable(spark: SparkSession, table: String, cols: Seq[String],
      version: Long = -1L): (Long, Boolean) = {
    require(cols.nonEmpty, "analyzeMergeable needs at least one column")
    val v = if (version >= 0) version
      else SnapshotTable.latestVersion(table).getOrElse(
        throw new IllegalArgumentException(s"no versions in $table"))
    val out = msidecar(table, v)
    if (Files.exists(out)) return (v, false)
    val files = SnapshotTable.filesOf(table, v).toSet
    val parent = SnapshotTable.versions(table).filter(_ < v).lastOption
      .filter(p => Files.exists(msidecar(table, p)))
      .filter { p =>
        val pf = SnapshotTable.filesOf(table, p).toSet
        pf.subsetOf(files) && files.size > pf.size
      }
    val (state, incremental) = parent
      // a parent analyzed over a DIFFERENT column set cannot seed the
      // fold — fall back to a full recompute (correct, just not priced
      // by the delta) rather than failing the analyze
      .map(p => (p, readMergeableState(table, p).get))
      .filter { case (_, prior) => prior.map(_.column).toSet == cols.toSet } match {
      case Some((p, prior)) =>
        val delta = (files -- SnapshotTable.filesOf(table, p)).toSeq.sorted
        (mergeStates(spark, prior,
          mprofile(spark.read.parquet(delta: _*), cols)), true)
      case None =>
        (mprofile(SnapshotTable.read(spark, table, v), cols), false)
    }
    persistMergeable(out, state)
    (v, incremental)
  }

  private def persistMergeable(out: java.nio.file.Path, state: Seq[MCol]): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val arr = mapper.createArrayNode()
    state.foreach { m =>
      val o = mapper.createObjectNode()
      o.put("column", m.column); o.put("dtype", m.dtype)
      o.put("n_rows", m.nRows); o.put("n_nulls", m.nNulls)
      if (m.minStr == null) o.putNull("min_str") else o.put("min_str", m.minStr)
      if (m.maxStr == null) o.putNull("max_str") else o.put("max_str", m.maxStr)
      if (m.sketch == null) o.putNull("sketch")
      else o.put("sketch", java.util.Base64.getEncoder.encodeToString(m.sketch))
      arr.add(o)
    }
    Files.createDirectories(out.getParent)
    val tmp = out.getParent.resolve(s".tmp-${java.util.UUID.randomUUID()}.json")
    Files.write(tmp, mapper.writeValueAsBytes(arr))
    try Files.move(tmp, out, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    catch { case _: java.nio.file.FileAlreadyExistsException => Files.deleteIfExists(tmp) }
  }

  private def readMergeableState(table: String, version: Long): Option[Seq[MCol]] = {
    val p = msidecar(table, version)
    if (!Files.exists(p)) return None
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val arr = mapper.readTree(Files.readAllBytes(p))
    import scala.jdk.CollectionConverters._
    Some(arr.elements().asScala.map { o =>
      MCol(o.get("column").asText(), o.get("dtype").asText(),
        o.get("n_rows").asLong(), o.get("n_nulls").asLong(),
        if (o.get("min_str").isNull) null else o.get("min_str").asText(),
        if (o.get("max_str").isNull) null else o.get("max_str").asText(),
        if (o.get("sketch").isNull) null
        else java.util.Base64.getDecoder.decode(o.get("sketch").asText()))
    }.toSeq)
  }

  /** The persisted mergeable profile as a frame in [[readProfile]]'s
    * schema — n_distinct estimated from the stored sketch, zero data I/O. */
  def readMergeableProfile(spark: SparkSession, table: String,
      version: Long = -1L): Option[DataFrame] = {
    val v = if (version >= 0) version
      else SnapshotTable.latestVersion(table).getOrElse(return None)
    readMergeableState(table, v).map { state =>
      val ndvExprs = state.map(m =>
        (if (m.sketch == null) lit(0L)
         else hll_sketch_estimate(lit(m.sketch))).as(s"__ndv_${m.column}"))
      val ndvRow = spark.range(1).select(ndvExprs: _*).collect().head
      import spark.implicits._
      state.map(m => (m.column, m.nRows, m.nNulls,
          ndvRow.getAs[Long](s"__ndv_${m.column}"), m.minStr, m.maxStr))
        .toDF("column", "n_rows", "n_nulls", "n_distinct", "min_str", "max_str")
        .orderBy("column")
    }
  }
}
