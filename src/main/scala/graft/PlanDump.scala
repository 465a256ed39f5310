package graft

/** Dev tool: print the formatted physical plan of named gate queries —
  * the "is this the plan you'd want at 100×" audit loop. Not part of the
  * gate surface.
  *
  * Usage: runMain graft.PlanDump <sfDir> <query> [query ...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local(8)
    args.drop(1).foreach { name =>
      println(s"\n===== $name =====")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      graft.operators.LlmOps.clearPlanted()
      graft.operators.Caches.releaseAll()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
