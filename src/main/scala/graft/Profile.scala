package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Dev tool: run named gate queries with a job-level profiler — per-job
  * wall, task count and task-time sum, so "where does this gate's wall
  * go" is one run instead of UI archaeology (the UI is disabled in bench
  * runs). Not part of the gate surface.
  *
  * Usage: runMain graft.Profile [<sfDir>] <query> [query ...]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val (sfDir, names) =
      if (args.headOption.exists(a => new java.io.File(a).isDirectory))
        (args.head, args.drop(1))
      else ("/root/testdata/sf0.1", args)
    require(names.nonEmpty, "usage: Profile [<sfDir>] <query> [query ...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus)

    final case class Job(id: Int, t0: Long, desc: String)
    val open = new java.util.concurrent.ConcurrentHashMap[Int, Job]
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Job, Long)]
    val stageTasks = new java.util.concurrent.ConcurrentHashMap[Int, (Int, Long)]
    val stageNames = new java.util.concurrent.ConcurrentHashMap[Int, String]
    val jobStages = new java.util.concurrent.ConcurrentHashMap[Int, Seq[Int]]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .filter(_.nonEmpty)
          .orElse(e.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n')))
          .getOrElse("")
        open.put(e.jobId, Job(e.jobId, System.nanoTime(), d))
        jobStages.put(e.jobId, e.stageIds.map(_.toInt)): Unit
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = open.remove(e.jobId)
        if (j != null) done.add((j, System.nanoTime())): Unit
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        stageTasks.put(si.stageId,
          (si.numTasks, si.taskMetrics.executorRunTime)): Unit
        stageNames.put(si.stageId, si.name.takeWhile(_ != '\n')): Unit
      }
    }
    spark.sparkContext.addSparkListener(listener)

    names.foreach { name =>
      open.clear(); done.clear(); stageTasks.clear(); jobStages.clear()
      stageNames.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // let straggling listener events drain
      Thread.sleep(300)
      import scala.jdk.CollectionConverters._
      val jobs = done.asScala.toSeq.sortBy(_._1.id)
      println(f"\n===== $name: wall $wall%.2f s, ${jobs.size} jobs =====")
      val byDesc = jobs.groupBy(_._1.desc.take(90)).map { case (d, js) =>
        val w = js.map { case (j, t1) => (t1 - j.t0) / 1e9 }.sum
        val tasks = js.flatMap { case (j, _) =>
          jobStages.getOrDefault(j.id, Seq.empty)
            .flatMap(s => Option(stageTasks.get(s))) }
        (d, js.size, w, tasks.map(_._1).sum, tasks.map(_._2).sum / 1e3)
      }.toSeq.sortBy(-_._3)
      println(f"${"jobs"}%5s ${"wall_s"}%8s ${"tasks"}%6s ${"taskCPU_s"}%9s  desc")
      byDesc.take(30).foreach { case (d, n, w, nt, tt) =>
        println(f"$n%5d $w%8.2f $nt%6d $tt%9.2f  $d")
      }
      val jw = jobs.map { case (j, t1) => (t1 - j.t0) / 1e9 }.sum
      println(f"sum of job walls: $jw%.2f s (gaps = driver-side: ${wall - jw}%.2f s)")
      println(f"top stages by task-time:")
      val stages = stageTasks.asScala.toSeq
        .map { case (sid, (nt, rt)) =>
          (sid, nt, rt / 1e3, stageNames.getOrDefault(sid, "")) }
        .sortBy(-_._3)
      stages.take(15).foreach { case (sid, nt, rt, nm) =>
        println(f"  stage $sid%5d $nt%5d tasks $rt%8.2f s  $nm")
      }
      graft.operators.LlmOps.clearPlanted()
      graft.operators.Caches.releaseAll()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
