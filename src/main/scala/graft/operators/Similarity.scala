package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (SURVEY.md §2.3 S1/S2/D5).
  *
  * Scale shape: the query set is small and the corpus is huge, so S1
  * broadcasts the queries over a single corpus scan (no shuffle of the
  * corpus). S2/D5 bucket by a deterministic hyperplane signature so only
  * same-bucket candidates are scored — and the bucket count SCALES WITH THE
  * CORPUS (`bits = 0` auto-sizes to ~log2(n/target)): a fixed bucket count
  * would make candidate pairs grow ~n²/2^bits, quadratic at any fixed bits.
  */
object Similarity {

  /** Bucket-bit auto-sizing: enough buckets that the mean bucket holds
    * ~`targetBucket` vectors, capped at 24 bits (the int bucket id).
    * Candidate volume per table ≈ n·targetBucket instead of n²/2^bits —
    * linear in the corpus. `minBits` floors the count: dedup (high
    * threshold, recall structural) can afford many bits; top-k search needs
    * populated buckets for recall, so its floor is low. */
  private[operators] def autoBits(n: Long, targetBucket: Int, minBits: Int): Int = {
    val raw = math.ceil(math.log(math.max(1.0, n.toDouble / targetBucket)) / math.log(2.0)).toInt
    math.min(24, math.max(minBits, raw))
  }

  /** Top-k finish shared by S1/S2/S3: (cosine desc, neighbor_id asc) per
    * query via the native bounded-heap plan node. The earlier
    * `row_number().over(Window.partitionBy("query_id"))` finish funneled
    * every scored candidate of a query onto ONE partition — at 100 TB each
    * query's partition held the whole corpus. The TopK node keeps a k-row
    * heap per group per partition (map-side), then merges the ≤ partitions×k
    * survivors after one slim shuffle. */
  private[operators] def topKFinish(scored: DataFrame, k: Int): DataFrame =
    graft.plans.TopK.perGroupOrdered(scored, Seq("query_id"),
      Seq("cosine" -> false, "neighbor_id" -> true), k)

  /** S1: brute-force cosine top-k — the exact baseline. `queries` and
    * `corpus` need (idCol, vecCol). Returns (query_id, neighbor_id, cosine)
    * with k rows per query, self-matches excluded.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
      k: Int = 5): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val scored = broadcast(q).crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("__qv"), col("__cv")).as("cosine"))
    topKFinish(scored, k)
  }

  /** Probe masks for multi-probe LSH: every bucket-id XOR mask within
    * Hamming distance `radius` of zero, over `bits` signature bits. Radius 2
    * over b bits is 1 + b + b(b-1)/2 masks — a CONSTANT multiplier on query
    * candidate volume, independent of corpus size. */
  private[operators] def probeMasks(bits: Int, radius: Int): Seq[Int] = {
    val singles = (0 until bits).map(1 << _)
    val pairs = for (i <- 0 until bits; j <- i + 1 until bits) yield (1 << i) | (1 << j)
    (Seq(0) ++ (if (radius >= 1) singles else Nil) ++
      (if (radius >= 2) pairs else Nil)).distinct
  }

  /** S2: LSH-bucketed ANN. Both sides are hashed into 2^bits hyperplane
    * buckets across `tables` independent hash tables; candidates = same
    * bucket in any table. The QUERY side is multi-probed (Lv et al.,
    * "Multi-Probe LSH", VLDB'07): each query also inspects the buckets
    * within Hamming distance `probes` of its own signature — a near-miss on
    * one or two hyperplanes is the dominant recall failure, and probing
    * those neighbors buys the recall of many extra hash tables for a
    * constant per-query fan-out instead of another full corpus hash pass.
    * Recall < 1 by design — the s2_recall gate bounds it against S1.
    * `bits = 0` auto-sizes from the corpus (target bucket ≈ 64, generous to
    * protect recall; queries are broadcast so candidate volume is
    * |queries|·bucket·tables·masks, not corpus-quadratic).
    *
    * `knownN`: corpus row count for the auto-sizing. When absent (< 0) the
    * operator pays ONE extra corpus action (`count()`) just to size the
    * buckets — at 100 TB that is an extra pass, so callers at scale should
    * supply it (from catalog stats, a footer-only count of the base table,
    * or pass `bits` explicitly).
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
      k: Int = 5, bits: Int = 0, tables: Int = 4, dim: Int = 64,
      knownN: Long = -1L, probes: Int = 2): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val b = if (bits > 0) bits
      else autoBits(if (knownN >= 0) knownN else c.count(), targetBucket = 64, minBits = 4)
    def bucketed(df: DataFrame, id: String, vec: String, masks: Seq[Int]): DataFrame =
      df.select(col(id), col(vec),
        explode(array((for (t <- 0 until tables; m <- masks) yield
          struct(lit(t).as("table"),
            hyperplaneBucket(col(vec), b, dim, seed = 1000 + t).bitwiseXOR(lit(m))
              .as("bucket"))): _*)).as("tb"))
        .select(col(id), col(vec), col("tb.table").as("table"), col("tb.bucket").as("bucket"))

    val q = bucketed(
      broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))),
      "query_id", "__qv", probeMasks(b, probes))
    val candidates = q.join(bucketed(c, "neighbor_id", "__cv", Seq(0)), Seq("table", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("__qv"), col("__cv"))
      .dropDuplicates("query_id", "neighbor_id")
    val scored = candidates
      .select(col("query_id"), col("neighbor_id"), cosine(col("__qv"), col("__cv")).as("cosine"))
    topKFinish(scored, k)
  }

  /** D5: embedding-cosine near-duplicate pairs above `threshold`, via the
    * same hyperplane bucketing (candidates must collide in some table).
    * Returns (id_a, id_b, cosine), id_a < id_b.
    *
    * Scale shape: the bucket join ships only (table, bucket, id) — never the
    * vectors; candidate pairs are dedup'd on bare ids and only the surviving
    * pairs re-join their two vectors for the cosine check. `bits = 0`
    * auto-sizes the bucket count to the corpus (target bucket ≈ 16);
    * `knownN` supplies the row count for that sizing — when absent the
    * operator pays one extra corpus `count()` action (avoid at scale, see
    * `lshTopK`). The persisted staging frame is Caches-owned: consumers
    * release it with `Caches.releaseAll()` after materializing the result.
    */
  def embeddingDedup(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.99, bits: Int = 0, tables: Int = 4, dim: Int = 64,
      knownN: Long = -1L): DataFrame = {
    val base = Caches.owned(df.select(col(idCol).as("id"), col(vecCol).as("vec")))
    val b = if (bits > 0) bits
      else autoBits(if (knownN >= 0) knownN else base.count(), targetBucket = 16, minBits = 8)
    val buckets = base.select(col("id"),
      explode(array((0 until tables).map(t =>
        struct(lit(t).as("table"), hyperplaneBucket(col("vec"), b, dim, seed = 2000 + t).as("bucket"))): _*)).as("tb"))
      .select(col("id"), col("tb.table").as("table"), col("tb.bucket").as("bucket"))
    val pairs = buckets.select(col("table"), col("bucket"), col("id").as("id_a"))
      .join(buckets.select(col("table"), col("bucket"), col("id").as("id_b")), Seq("table", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    pairs
      .join(base.select(col("id").as("id_a"), col("vec").as("vec_a")), Seq("id_a"))
      .join(base.select(col("id").as("id_b"), col("vec").as("vec_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("vec_a"), col("vec_b")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
