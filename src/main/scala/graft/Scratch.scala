package graft

import java.nio.file.{Files, Path, Paths}

/** Fixed, reusable scratch directories for gate queries that must write to
  * disk (sink round-trips, compaction, CDC state). These used to draw a
  * fresh `Files.createTempDirectory` per invocation, which leaked one full
  * copy of the written data per Verify/Bench run — repeated rounds grew
  * /tmp without bound. A fixed per-name path, deleted and recreated on each
  * use, bounds total scratch at one live copy per gate. */
object Scratch {

  private val root = Paths.get(sys.props("java.io.tmpdir"), "graft_scratch")

  /** Delete-then-recreate the fixed scratch dir for `name`; returns its
    * absolute path. NOT for concurrent callers sharing a name — gates run
    * sequentially in Verify/Bench, and specs use distinct names. */
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
