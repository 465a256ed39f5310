package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted join for skewed keys (SURVEY.md §5).
  *
  * AQE's skew-join split handles most skew at runtime; salting is the static
  * fallback when one key dominates so badly that even split partitions
  * hot-spot (the classic "null key / megacity" problem at 100 TB). The big
  * side gets a deterministic per-row salt, the small side is exploded
  * `salts`-fold, and the join key becomes (key, salt) — hot keys spread over
  * `salts` reducers at the cost of duplicating the small side.
  */
object SkewJoin {

  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int = 8): DataFrame = {
    require(salts > 0, "salts must be positive")
    // salt from a hash of the whole row: deterministic (no rand(), so plans
    // are replayable/resumable) yet uniform across identical keys
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col).toSeq: _*)), lit(salts)).cast("int"))
    val saltedSmall = small
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
