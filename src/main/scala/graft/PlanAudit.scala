package graft

/** Dev tool: print formatted physical plans for the gate queries so plan
  * hygiene is auditable (PushedFilters reaching scans, pruned ReadSchema,
  * broadcast joins on dims, WholeStageCodegen coverage).
  *
  * Usage: runMain graft.PlanAudit [sfDir] [queryName ...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.local()
    for (name <- names) {
      println(s"\n========== $name ==========")
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      } catch {
        case e: Throwable => println(s"ERROR: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
