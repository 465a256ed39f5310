package graft.operators

import graft.functions.{PqExpressions, VectorExpressions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S6: IVF-PQ composed index (SURVEY §2.3) — the production ANN shape that
  * neither S3 nor S5 gives alone: S3's inverted file prunes the corpus per
  * query but stores FULL vectors (memory-bound at 1e9+ vectors); S5's PQ
  * codes compress 32×+ but have no cell structure (every query scans every
  * code). Composing them is what every real vector store does (FAISS
  * IndexIVFPQ): an IVF coarse quantizer routes queries to cells, PQ codes of
  * the CELL RESIDUAL v − centroid(cid) stand in for the vectors, and search
  * scores candidates with asymmetric distance (exact query vs quantized
  * candidate) before an exact re-rank of a bounded shortlist.
  *
  * Search pipeline and its scale shape:
  *   1. probe: each query's `nprobe` nearest cells via the shared
  *      [[IvfAnn.cellSelector]] kernel (two-level above 4096 cells);
  *   2. ADC tables: per (query, probed cell) ONE m×k distance table over
  *      the residual q − centroid ([[PqExpressions.adcTable]]) — O(k·dim)
  *      once, amortized over every candidate in the cell;
  *   3. score: broadcast the (query, cell, table) frame, hash-join the
  *      encoded corpus on cid — each candidate costs m array lookups
  *      ([[PqExpressions.adcScore]]), never a dim-length scan, and the
  *      corpus side ships (id, cid, m codes): the 32×-compressed store is
  *      what crosses memory, not vectors;
  *   4. shortlist: bounded-heap top-`shortlist` per query by ADC distance
  *      (the TopK plan node — map-side heaps, one slim shuffle of ids +
  *      one double; tables and vectors never reach the exchange);
  *   5. re-rank: join the surviving ids back to the raw vectors and score
  *      exact cosine — quantization error affects WHICH `shortlist`
  *      candidates surface, never the final ranking among them.
  *
  * Training follows the house Lloyd discipline (sample-capped, driver holds
  * only centroids/codebooks — cells×dim + m×k×(dim/m) doubles). Encoding and
  * ADC are deterministic given an index (first-index argmin tie-breaks), so
  * planted exact copies always share cid AND codes — the structural gate.
  */
object IvfPq {

  /** cells×dim coarse centroids + shared residual codebooks (m subspaces ×
    * k codewords). Driver-resident by design, shipped to executors as
    * codegen reference objects. */
  final case class Index(centroids: Seq[Array[Double]],
      cb: ProductQuantizer.Codebooks)

  /** Train the coarse quantizer on the corpus, then PQ codebooks on the
    * RESIDUALS of a deterministic hash sample (membership a pure function
    * of the vector — the T6 rule; the sample is assigned + residualized
    * before PQ training, so the training path touches O(sampleCap) rows
    * past the one Lloyd sampling pass). */
  def build(corpus: DataFrame, vecCol: String, cells: Int, m: Int, k: Int,
      iters: Int = 3, sampleCap: Long = 200000, knownN: Long = -1L): Index = {
    val cents = IvfAnn.trainCentroids(corpus, vecCol, cells, iters, sampleCap, knownN)
    val all = corpus.select(col(vecCol).cast("array<double>").as("v"))
    val n = if (knownN >= 0) knownN else all.count()
    val sampled = IvfAnn.hashSample(all, sampleCap, n)
    val cellsOf = IvfAnn.cellSelector(cents)
    val resid = sampled
      .withColumn("cid", element_at(cellsOf(col("v"), 1), 1))
      .select(PqExpressions.centroidResidual(col("v"), col("cid"), cents).as("r"))
    // the residual frame is already ≤ sampleCap rows — disable PQ's second
    // sampling pass (and its count) rather than sampling a sample
    val cb = ProductQuantizer.train(resid, "r", m, k, iters,
      sampleCap = Long.MaxValue, knownN = math.min(n, sampleCap),
      knownDim = cents.head.length)
    Index(cents, cb)
  }

  /** The compressed candidate store: (idCol, cid, codesCol). This is the
    * frame a 100 TB deployment persists INSTEAD of the vectors — m ints
    * (bytes, at k ≤ 256) + a cell id per row. */
  def encode(corpus: DataFrame, idCol: String, vecCol: String, index: Index,
      codesCol: String = "pq_codes"): DataFrame = {
    val cellsOf = IvfAnn.cellSelector(index.centroids)
    corpus
      .select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
      .withColumn("cid", element_at(cellsOf(col("__v"), 1), 1))
      .select(col(idCol), col("cid"),
        PqExpressions.pqEncode(col("__v"), col("cid"), index.centroids,
          index.cb.books).as(codesCol))
  }

  /** ADC search over a pre-encoded corpus, exact-cosine re-rank against the
    * raw `corpus` vectors. Returns (query_id, neighbor_id, cosine), k rows
    * per query, (cosine desc, neighbor_id asc), self-matches excluded. */
  def search(queries: DataFrame, encoded: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, index: Index, k: Int = 5,
      nprobe: Int = 2, shortlist: Int = 64,
      codesCol: String = "pq_codes"): DataFrame = {
    val cellsOf = IvfAnn.cellSelector(index.centroids)
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("__qv"))
    // one ADC table per (query, probed cell), built before the broadcast —
    // nprobe·|queries| rows of m·k doubles, never per-candidate work
    val probes = broadcast(q
      .withColumn("cid", explode(cellsOf(col("__qv"), nprobe)))
      .withColumn("__tab", PqExpressions.adcTable(col("__qv"), col("cid"),
        index.centroids, index.cb.books))
      .select("query_id", "cid", "__tab"))
    val cand = probes.join(encoded, Seq("cid"))
      .filter(col("query_id") =!= col(idCol))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        PqExpressions.adcScore(col("__tab"), col(codesCol)).as("__adc"))
    // bounded-heap shortlist by ADC distance ascending; ids only from here
    val short = graft.plans.TopK.perGroupOrdered(cand, Seq("query_id"),
        Seq("__adc" -> true, "neighbor_id" -> true), shortlist)
      .select("query_id", "neighbor_id")
    // exact re-rank: shortlist ids (≤ |queries|·shortlist rows) broadcast
    // against the raw vectors — quantization never ranks the final k
    val rescored = broadcast(short)
      .join(corpus.select(col(idCol).as("neighbor_id"),
        col(vecCol).as("__cv")), Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        VectorExpressions.cosineNative(col("__qv"), col("__cv")).as("cosine"))
    Similarity.topKFinish(rescored, k)
  }
}
