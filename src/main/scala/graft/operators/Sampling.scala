package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash sampling and dataset splits (SURVEY.md §2.3 T6).
  *
  * Training pipelines need REPRODUCIBLE sampling: `df.sample()` draws from
  * a per-partition RNG, so the subset changes with partitioning, retries
  * and cluster size — useless for a train/val/test split that must be
  * stable across reruns and engines. Here membership is a pure function of
  * the row's id: the first 8 hex chars of md5(id) give a uniform 32-bit
  * value, compared against exact integer thresholds. Same id → same split,
  * on any cluster, any day, any engine (md5 agrees everywhere), and the
  * whole thing is one codegen'd projection — no shuffle, no RNG state.
  */
object Sampling {

  /** Uniform u ∈ [0, 2^32) derived from the id. */
  def hashUnit(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long")

  /** Keep a deterministic `fraction` of rows (by id hash). */
  def hashSample(df: DataFrame, idCol: String, fraction: Double): DataFrame =
    df.filter(hashUnit(col(idCol)) < math.round(fraction * 4294967296.0))

  /** Add a `split` column assigning each row to a named fraction, e.g.
    * `Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)` (order matters;
    * fractions must sum to ~1). Thresholds are exact longs so the oracle
    * can mirror them digit-for-digit. */
  def assignSplits(df: DataFrame, idCol: String,
      splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "split fractions must sum to 1")
    val thresholds = cumulativeThresholds(splits)
    val u = hashUnit(col(idCol))
    val expr = thresholds.init.foldRight(lit(thresholds.last._1): Column) {
      case ((name, upper), rest) => when(u < upper, name).otherwise(rest)
    }
    df.withColumn("split", expr)
  }

  /** Deterministic stratified sample: exactly `n` rows per stratum (fewer if
    * the stratum is smaller), chosen by md5(id) order — the training-data
    * "balance by language/source" operation. Membership is a pure function of
    * (stratum, id) like the splits above: same rows on any cluster, any rerun,
    * any engine. The per-stratum selection runs through the bounded-heap
    * `TopK` plan node (SURVEY §2.2 P1) — O(n) state per stratum per partition
    * and shuffle volume ≤ strata × n × partitions, where a window row_number
    * would sort each stratum's full contents on a single partition (a
    * boilerplate-language stratum at 100 TB is most of the corpus).
    */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String, n: Int): DataFrame =
    graft.plans.TopK.perGroupOrdered(
        df.withColumn("__u", md5(col(idCol).cast("string"))),
        Seq(strataCol), Seq("__u" -> true, idCol -> true), n)
      .drop("__u")

  /** (name, exclusive upper bound in [0, 2^32]) per split, cumulative. */
  def cumulativeThresholds(splits: Seq[(String, Double)]): Seq[(String, Long)] = {
    var acc = 0.0
    splits.map { case (name, f) =>
      acc += f
      name -> math.round(acc * 4294967296.0)
    }
  }
}
