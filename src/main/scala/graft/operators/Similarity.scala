package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (SURVEY.md §2.3 S1/S2/D5).
  *
  * Scale shape: the query set is small and the corpus is huge, so S1
  * broadcasts the queries over a single corpus scan (no shuffle of the
  * corpus). S2 buckets both sides by a deterministic hyperplane signature so
  * only same-bucket candidates are scored — the IVF/LSH trade of recall for
  * a bucket-bounded candidate count.
  */
object Similarity {

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
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k).drop("rk")
  }

  /** S2: LSH-bucketed ANN. Both sides are hashed into 2^bits hyperplane
    * buckets across `tables` independent hash tables; candidates = same
    * bucket in any table. Recall < 1 by design — the spec measures it
    * against S1.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
      k: Int = 5, bits: Int = 6, tables: Int = 4, dim: Int = 64): DataFrame = {
    def bucketed(df: DataFrame, id: String, vec: String): DataFrame =
      df.select(col(idCol).as(id), col(vecCol).as(vec),
        explode(array((0 until tables).map(t =>
          struct(lit(t).as("table"), hyperplaneBucket(col(vecCol), bits, dim, seed = 1000 + t).as("bucket"))): _*)).as("tb"))
        .select(col(id), col(vec), col("tb.table").as("table"), col("tb.bucket").as("bucket"))

    val q = bucketed(broadcast(queries), "query_id", "__qv")
    val c = bucketed(corpus, "neighbor_id", "__cv")
    val candidates = q.join(c, Seq("table", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("__qv"), col("__cv"))
      .dropDuplicates("query_id", "neighbor_id")
    val scored = candidates
      .select(col("query_id"), col("neighbor_id"), cosine(col("__qv"), col("__cv")).as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k).drop("rk")
  }

  /** D5: embedding-cosine near-duplicate pairs above `threshold`, via the
    * same hyperplane bucketing (candidates must collide in some table).
    * Returns (id_a, id_b, cosine), id_a < id_b.
    */
  def embeddingDedup(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.99, bits: Int = 6, tables: Int = 4, dim: Int = 64): DataFrame = {
    val hashed = df.select(col(idCol).as("id"), col(vecCol).as("vec"),
      explode(array((0 until tables).map(t =>
        struct(lit(t).as("table"), hyperplaneBucket(col(vecCol), bits, dim, seed = 2000 + t).as("bucket"))): _*)).as("tb"))
      .select(col("id"), col("vec"), col("tb.table").as("table"), col("tb.bucket").as("bucket"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = hashed.select(col("table"), col("bucket"), col("id").as("id_a"), col("vec").as("vec_a"))
    val b = hashed.select(col("table"), col("bucket"), col("id").as("id_b"), col("vec").as("vec_b"))
    a.join(b, Seq("table", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("vec_a"), col("vec_b"))
      .dropDuplicates("id_a", "id_b")
      .select(col("id_a"), col("id_b"), cosine(col("vec_a"), col("vec_b")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
