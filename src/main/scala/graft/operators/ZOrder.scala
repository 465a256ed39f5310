package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustered writes — multi-dimensional data layout
  * (SURVEY.md §2.2 R21).
  *
  * A sort on ONE column gives parquet row-group min/max stats that prune
  * scans filtered on that column — and nothing else: in a custkey-sorted
  * table every file spans the full totalprice range, so a totalprice filter
  * reads everything. Interleaving the bits of several columns' bucket ranks
  * into one sort key makes each file a small hyper-rectangle in ALL
  * clustered dimensions at once; a selective filter on ANY of them prunes
  * most files. This is the layout operation Delta/Iceberg call ZORDER BY,
  * expressed over plain parquet: at 100 TB it is the difference between a
  * full scan and reading a few percent for the second-dimension query
  * pattern, with zero read-path changes (plain row-group stats do the
  * pruning).
  *
  * Shapes: one stats pass (min/max per clustered column — driver scalars;
  * pass `knownStats` to skip it when the catalog already has them), then one
  * range shuffle on the z-value and a per-partition sort — exactly a global
  * sort's cost. Bucketing is uniform min/max quantization: right for the
  * roughly-uniform testdata keys; heavily skewed columns want quantile
  * boundaries instead (same interleave, different rank function — noted, not
  * implemented). Clustered columns must be numeric/temporal.
  */
object ZOrder {

  /** Interleave the low `bits` bits of each bucket-rank column (Morton
    * order): bit b of column i lands at position b*n + i. Pure column
    * algebra — codegen'd shifts/masks, no UDF. */
  def zvalue(bucketRanks: Seq[Column], bits: Int): Column = {
    val n = bucketRanks.size
    require(n >= 1, "need at least one column")
    require(bits * n <= 63, s"bits($bits) * cols($n) must fit a signed long")
    (0 until bits).flatMap { b =>
      bucketRanks.zipWithIndex.map { case (c, i) =>
        shiftleft(shiftright(c, b).bitwiseAND(lit(1L)), b * n + i)
      }
    }.reduce(_ bitwiseOR _)
  }

  /** Uniform bucket rank in [0, 2^bits): (c - min) / (max - min) quantized.
    * Degenerate ranges (min == max) collapse to bucket 0. */
  private def bucketRank(c: Column, mn: Double, mx: Double, bits: Int): Column = {
    val top = (1L << bits) - 1
    if (!(mx > mn)) lit(0L)
    else least(lit(top), greatest(lit(0L),
      floor((c.cast("double") - lit(mn)) / lit(mx - mn) * top).cast("long")))
  }

  /** Shared clustering tail: interleave the ranks, one range shuffle on the
    * z-value, per-partition sort, drop the key (projection preserves the
    * sort, so row-group stats come out tight in every clustered dim).
    * Returned as a FRAME so sinks that control their own write — R41's
    * snapshot OPTIMIZE commits through the manifest log — reuse the exact
    * layout the direct writers produce. */
  private[operators] def frameByRanks(df: DataFrame, ranks: Seq[Column],
      partitions: Int, bitsPerCol: Int): DataFrame =
    df.withColumn("__z", zvalue(ranks, bitsPerCol))
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")

  private def writeByRanks(df: DataFrame, ranks: Seq[Column], out: String,
      partitions: Int, bitsPerCol: Int): Unit =
    frameByRanks(df, ranks, partitions, bitsPerCol)
      .write.mode("overwrite").parquet(out)

  /** The uniform-rank clustered frame of [[writeClustered]], unwritten. */
  def clusteredFrame(df: DataFrame, cols: Seq[String], partitions: Int,
      bitsPerCol: Int = 12,
      knownStats: Option[Seq[(Double, Double)]] = None): DataFrame = {
    val stats = knownStats.getOrElse(columnStats(df, cols))
    val ranks = cols.zip(stats).map { case (c, (mn, mx)) =>
      bucketRank(col(c), mn, mx, bitsPerCol)
    }
    frameByRanks(df, ranks, partitions, bitsPerCol)
  }

  private def columnStats(df: DataFrame, cols: Seq[String]): Seq[(Double, Double)] = {
    val aggs = cols.flatMap(c => Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
      .zipWithIndex.map { case (c, i) => c.as(s"s$i") }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cols.indices.map(i => (row.getDouble(2 * i), row.getDouble(2 * i + 1)))
  }

  /** Write `df` as parquet clustered on `cols` with UNIFORM min/max bucket
    * ranks — right for roughly-uniform keys; heavily skewed columns want
    * `writeClusteredQuantile`. `knownStats` = (min, max) per column to skip
    * the stats pass. */
  def writeClustered(df: DataFrame, cols: Seq[String], out: String,
      partitions: Int, bitsPerCol: Int = 12,
      knownStats: Option[Seq[(Double, Double)]] = None): Unit =
    clusteredFrame(df, cols, partitions, bitsPerCol, knownStats)
      .write.mode("overwrite").parquet(out)

  /** Skew-resistant variant: bucket ranks from approx-quantile boundaries
    * instead of uniform min/max quantization. On a long-tailed column
    * (zipfian ids, prices with outliers) uniform quantization collapses —
    * one far outlier stretches the range so virtually every row lands in
    * bucket 0 and the layout stops separating the dense region; quantile
    * boundaries give ~equal-mass buckets by construction, so files stay
    * tight exactly where the data is dense. Boundary lookup compiles to a
    * codegen'd comparison chain (rank = #boundaries ≤ value — no UDF);
    * 2^bits−1 boundaries per column, so keep bits small (default 6 = 64
    * equal-mass buckets, plenty for file-level pruning: files ≫ buckets is
    * never the binding constraint at scale). The quantile sketch is one
    * extra pass over the clustered columns (same class of stats pass as
    * `writeClustered`'s min/max; at scale feed it from table stats). */
  def writeClusteredQuantile(df: DataFrame, cols: Seq[String], out: String,
      partitions: Int, bitsPerCol: Int = 6): Unit = {
    val nb = 1 << bitsPerCol
    val probs = (1 until nb).map(_.toDouble / nb).toArray
    val bounds = df.stat.approxQuantile(cols.toArray, probs, 1.0 / (8 * nb))
    val ranks = cols.zip(bounds).map { case (c, bs) =>
      bs.distinct.sorted.map(b => when(col(c).cast("double") >= b, 1L).otherwise(0L))
        .reduce(_ + _)
    }
    writeByRanks(df, ranks, out, partitions, bitsPerCol)
  }
}
