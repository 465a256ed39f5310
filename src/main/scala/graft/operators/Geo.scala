package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.graft.ColumnBridge

/** W24: geo-radius search over the coordinates table (W8's
  * `(id, latitude, longitude)` output, value.rs:207-217 routing) — "the k
  * nearest entities within R of a point", the location query the
  * reference's SQLite schema holds the data for but its README's
  * LIKE/equality patterns never answer.
  *
  * Metric: local equirectangular distance on INTEGER microdegrees —
  *   dist2 = dlat² + ((|dlon| · cos_pm) div 1000)²
  * with `cos_pm` = cos(query latitude) in per-mille, evaluated ONCE on
  * the driver and inlined as a literal into both the Spark plan and the
  * oracle SQL. That keeps the entire predicate and ranking in long
  * arithmetic — bit-identical on any engine/partitioning (the W23
  * determinism trade; a per-row haversine would put libm sin/cos in the
  * hash path). Correct-by-construction for city-to-country-scale radii
  * where the flat-patch approximation holds (the error vs true haversine
  * is quadratic in the radius and confined to a thin boundary band —
  * GeoSpec bounds it empirically); absolute values keep every div
  * non-negative, so Spark's truncating div and DuckDB's `//` agree.
  *
  * Scale shape: the bounding box `lat ∈ [lat0±R]`, `lon ∈ [lon0±R/cos]`
  * is a pair of static range predicates — they reach the parquet scan as
  * PushedFilters (spec-asserted) and compose with Z-ORDER(lat, lon)
  * (R21) or manifest stats (R42) so a planet-scale table reads only the
  * bbox's files. The exact circle test is a residual on the surviving
  * rows, and the k-nearest cut plans as TakeOrderedAndProject
  * (per-partition heaps + driver merge, no global sort).
  */
object Geo {

  private def idiv(a: Column, b: Column): Column =
    ColumnBridge.column(IntegralDivide(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** cos(lat) in per-mille for a microdegree latitude — the ONE
    * transcendental, evaluated driver-side at plan time. */
  def cosPm(latMicro: Long): Long =
    Math.round(Math.cos(Math.toRadians(latMicro / 1e6)) * 1000)

  /** The k nearest points within `radiusMicro` of (lat0, lon0), as
    * (idCol, latCol, lonCol, dist2) ordered by (dist2, id). `dist2` is in
    * squared microdegrees of latitude; radius in equivalent latitude
    * microdegrees (R_km ≈ R_micro · 111.32 / 1e6). */
  def radiusSearch(points: DataFrame, idCol: String, latCol: String,
      lonCol: String, lat0Micro: Long, lon0Micro: Long, radiusMicro: Long,
      k: Int): DataFrame = {
    require(radiusMicro > 0 && k > 0)
    val c = cosPm(lat0Micro)
    require(c > 0, s"query latitude too close to a pole: cos_pm = $c")
    // lon half-width: the largest dlon whose scaled projection can still
    // pass the circle test is floor((R·1000 + 999)/c) — the +999 covers
    // the floor in dlonEff (ceil(R·1000/c) alone clips boundary points
    // where floor(dlon·c/1000) lands exactly on R; review-caught)
    val lonHalf = (radiusMicro * 1000 + 999) / c
    val dlat = abs(col(latCol) - lat0Micro)
    val dlon = abs(col(lonCol) - lon0Micro)
    val dlonEff = idiv(dlon * c, lit(1000L))
    val dist2 = dlat * dlat + dlonEff * dlonEff
    points
      .filter(col(latCol) >= lat0Micro - radiusMicro &&
        col(latCol) <= lat0Micro + radiusMicro &&
        col(lonCol) >= lon0Micro - lonHalf &&
        col(lonCol) <= lon0Micro + lonHalf) // static bbox → PushedFilters
      .withColumn("dist2", dist2)
      .filter(col("dist2") <= radiusMicro * radiusMicro) // exact residual
      .select(col(idCol), col(latCol), col(lonCol), col("dist2"))
      .orderBy(col("dist2"), col(idCol))
      .limit(k)
  }

  /** W25: all unordered pairs of points within `epsMicro` of each other
    * (squared-microdegree metric, dist2 = dlat² + dlon²) — the spatial
    * self-join behind "duplicate place entries", proximity clustering and
    * geofence matching. The coordinates table is exactly the data W8
    * routes; the reference's SQLite schema can only answer this O(n²).
    *
    * Grid blocking, the 2D analogue of R30's binned range join: cell
    * width = eps, the LEFT side replicates into its 3×3 neighborhood,
    * the RIGHT side stays home, so every true pair (dlat ≤ eps AND
    * dlon ≤ eps ⇒ adjacent cells) meets in exactly one (cell, order)
    * combination — `id_a < id_b` dedups the same-cell double-match and
    * nothing else, no distinct pass needed. One equi-shuffle on the cell
    * key (9n + n rows, (id, lat, lon) only), per-cell candidate work
    * bounded by local density; a dense city cell is an AQE skew split,
    * never a cross join. Coordinates are offset non-negative before the
    * cell division, so truncating div ≡ floor div on every engine.
    *
    * The metric is exact long arithmetic end to end (the W23/W24
    * determinism trade): no cos scaling — at pair-join radii (≪ 1°) the
    * longitude compression is a per-latitude-band constant production
    * callers fold into `epsMicro`; antimeridian-straddling pairs are not
    * neighbors under this metric (documented, consistent on both
    * engines). */
  def pairsWithin(points: DataFrame, idCol: String, latCol: String,
      lonCol: String, epsMicro: Long): DataFrame = {
    require(epsMicro > 0, s"need eps > 0, got $epsMicro")
    def cellLat(c: Column) = idiv(c + 90000000L, lit(epsMicro))
    def cellLon(c: Column) = idiv(c + 180000000L, lit(epsMicro))
    val offsets = for { di <- -1L to 1L; dj <- -1L to 1L }
      yield struct(lit(di).as("di"), lit(dj).as("dj"))
    val left = points
      .select(col(idCol).as("id_a"), col(latCol).as("lat_a"), col(lonCol).as("lon_a"))
      .withColumn("__o", explode(array(offsets: _*)))
      .select(col("id_a"), col("lat_a"), col("lon_a"),
        (cellLat(col("lat_a")) + col("__o.di")).as("__clat"),
        (cellLon(col("lon_a")) + col("__o.dj")).as("__clon"))
    val right = points.select(col(idCol).as("id_b"),
      col(latCol).as("lat_b"), col(lonCol).as("lon_b"),
      cellLat(col("lat_b")).as("__clat"), cellLon(col("lon_b")).as("__clon"))
    left.join(right, Seq("__clat", "__clon"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist2",
        (col("lat_a") - col("lat_b")) * (col("lat_a") - col("lat_b")) +
          (col("lon_a") - col("lon_b")) * (col("lon_a") - col("lon_b")))
      .filter(col("dist2") <= epsMicro * epsMicro)
      .select("id_a", "id_b", "dist2")
  }
}
