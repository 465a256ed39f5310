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
}
