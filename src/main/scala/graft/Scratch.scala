package graft

import java.nio.file.{Files, Path, Paths}

/** Fixed, reusable scratch directories for gate queries that must write to
  * disk (sink round-trips, compaction, CDC state). These used to draw a
  * fresh `Files.createTempDirectory` per invocation, which leaked one full
  * copy of the written data per Verify/Bench run — repeated rounds grew
  * /tmp without bound. A fixed per-name path, deleted and recreated on each
  * use, bounds total scratch at one live copy per gate.
  *
  * The root is namespaced PER PROCESS: two concurrent JVMs (an sbt test
  * run racing a Verify run) used to collide on the shared per-name paths —
  * one JVM's delete-recreate raced the other's in-flight write job, and a
  * gate read back an empty table. Dead processes' roots are reaped at
  * first use (via /proc liveness), so the storage bound survives the
  * namespacing. */
object Scratch {

  private val root: Path = {
    val base = Paths.get(sys.props("java.io.tmpdir"), "graft_scratch")
    // reap scratch roots of processes that no longer exist — bounded
    // growth across JVMs without racing a LIVE sibling
    if (Files.isDirectory(base) && Files.isDirectory(Paths.get("/proc"))) {
      val s = Files.list(base)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.foreach { d =>
          val n = d.getFileName.toString
          if (n.startsWith("pid-") &&
              !Files.exists(Paths.get("/proc", n.stripPrefix("pid-"))))
            try deleteRecursively(d) catch { case _: Exception => () }
          // pre-namespacing layout (bare gate names at the root): stale by
          // definition once any namespaced JVM runs — reap those too
          if (!n.startsWith("pid-"))
            try deleteRecursively(d) catch { case _: Exception => () }
        }
      } finally s.close()
    }
    base.resolve(s"pid-${ProcessHandle.current().pid()}")
  }

  /** Delete-then-recreate the fixed scratch dir for `name`; returns its
    * absolute path. NOT for concurrent callers sharing a name WITHIN one
    * JVM — gates run sequentially in Verify/Bench, and specs use distinct
    * names; cross-JVM isolation comes from the per-process root. */
  def fresh(name: String): String = {
    val dir = root.resolve(name)
    deleteRecursively(dir)
    Files.createDirectories(dir)
    dir.toString
  }

  /** Write `df` as exactly ONE parquet file at `dest` — the shard shape a
    * one-file-per-trigger streaming test feeds. Stages through a scratch
    * dir (repartition(1)), then moves the single part file. */
  def writeSingleParquet(df: org.apache.spark.sql.DataFrame, dest: Path): Unit = {
    val tmp = fresh(dest.getFileName.toString + "_stage")
    df.repartition(1).write.mode("overwrite").parquet(tmp)
    val s = Files.list(Paths.get(tmp))
    val part = try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.find { p =>
        val n = p.getFileName.toString
        n.startsWith("part-") && n.endsWith(".parquet")
      }.getOrElse(sys.error(s"no part file written under $tmp"))
    } finally s.close()
    Files.move(part, dest): Unit
  }

  private def deleteRecursively(p: Path): Unit = if (Files.exists(p)) {
    val walk = Files.walk(p)
    try {
      import scala.jdk.CollectionConverters._
      walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    } finally walk.close()
  }
}
