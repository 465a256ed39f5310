package graft

/** Every gate query in every gate map must RUN inside `sbt test`, not only
  * under the driver's Verify: a gate that compiles but fails at runtime
  * (bad column, unreadable scratch path, broken stream wiring) should be
  * caught here, before a driver round burns on it. Values stay the DuckDB
  * oracle's job; this asserts execution. (RelationalSpec carries the same
  * smoke test for the relational map plus value spot-checks.)
  */
class GateSmokeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  for ((group, qs) <- Seq(
      "llm" -> graft.operators.LlmOps.queries,
      "streaming" -> graft.streaming.StreamingGates.queries,
      "etl" -> graft.wikidata.EtlGates.queries)) {
    test(s"every $group gate query runs at sf0.001 (${qs.size} gates)") {
      for ((name, fn) <- qs.toSeq.sortBy(_._1)) {
        withClue(s"$name: ") {
          fn(spark, dir).limit(1).count() should be >= 0L
        }
        // gates own persists via Caches/plantedCache; release like Verify
        graft.operators.LlmOps.clearPlanted()
        graft.operators.Caches.releaseAll()
        spark.catalog.clearCache()
      }
    }
  }
}
