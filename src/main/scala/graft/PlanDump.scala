package graft

/** Dev tool: print the formatted physical plan of named gate queries —
  * the "is this the plan you'd want at 100×" audit loop. Not part of the
  * gate surface.
  *
  * Usage: runMain graft.PlanDump <sfDir> <query> [query ...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    // first arg is the sf dir only if it IS a directory; otherwise every
    // arg is a query name (a typo'd dir must not silently swallow a query)
    val (sfDir, names) =
      if (args.headOption.exists(a => new java.io.File(a).isDirectory))
        (args.head, args.drop(1))
      else ("/root/testdata/sf0.001", args)
    require(names.nonEmpty, "usage: PlanDump [<sfDir>] <query> [query ...]")
    val spark = GraftSession.local(8)
    names.foreach { name =>
      println(s"\n===== $name =====")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      graft.operators.LlmOps.clearPlanted()
      graft.operators.Caches.releaseAll()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
