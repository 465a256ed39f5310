package graft.wikidata

import graft.GraftSession
import graft.streaming.EtlStream
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

import java.io.{BufferedReader, InputStream, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** `bzcat dump.bz2 | wd2sql - out.db` parity (reference: src/main.rs:122-137):
  * ingest a dump from STDIN.
  *
  * A single pipe is inherently one-process, so the distributed shape is:
  * spool stdin into shard files (atomic rename so the file source never
  * sees a half-written shard) while a Structured Streaming query — the same
  * `EtlStream` used for watched-directory ingestion — processes shards as
  * they land and appends the 8 tables. The pipe reader is the only
  * single-threaded stage; parsing and routing fan out across the cluster,
  * which is exactly the split the reference cannot make.
  *
  * Usage: EtlStdin <output dir> [shardMB]
  */
object EtlStdin {

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: cat dump.json | EtlStdin <output dir> [shardMB]")
      sys.exit(2)
    }
    val outDir  = args(0)
    val shardMb = if (args.length > 1) args(1).toInt else 64
    if (Files.exists(Paths.get(outDir))) {
      System.err.println(s"The output '$outDir' already exists. Choose a new directory.")
      sys.exit(1)
    }
    val spark = GraftSession.local()
    val n = run(spark, System.in, outDir, shardMb.toLong * 1024 * 1024)
    println(s"ingested $n stdin lines")
    spark.stop()
  }

  /** Spool `in` into shards and stream-ETL them into `outDir`. Returns the
    * number of lines read. Factored from `main` so tests can feed a fake
    * stdin. */
  def run(spark: SparkSession, in: InputStream, outDir: String,
      shardBytes: Long = 64L * 1024 * 1024): Long = {
    val spoolDir = Files.createTempDirectory("graft-stdin-spool")
    val query = EtlStream.start(spark, spoolDir.toString, outDir,
      s"$outDir/_checkpoint", Trigger.ProcessingTime("1 second"))

    var shardNo = 0
    var lines   = 0L
    // buffer ENCODED bytes, not chars: a StringBuilder cut on char count
    // would overshoot the byte budget ~3-4× on multi-byte UTF-8 (Wikidata
    // labels), and doubles peak heap (String + encoded copy at flush)
    val buf = new java.io.ByteArrayOutputStream(1 << 20)
    def flush(): Unit = if (buf.size() > 0) {
      // write-then-rename: the file source must never list a partial shard
      val tmp: Path = spoolDir.resolve(f".tmp-shard-$shardNo%05d")
      val os = Files.newOutputStream(tmp)
      try buf.writeTo(os) finally os.close()
      Files.move(tmp, spoolDir.resolve(f"shard-$shardNo%05d.jsonl"),
        StandardCopyOption.ATOMIC_MOVE)
      shardNo += 1
      buf.reset()
    }

    val reader = new BufferedReader(new InputStreamReader(in, StandardCharsets.UTF_8))
    try {
      var line = reader.readLine()
      while (line != null) {
        buf.write(line.getBytes(StandardCharsets.UTF_8))
        buf.write('\n')
        lines += 1
        if (buf.size() >= shardBytes) flush()
        line = reader.readLine()
      }
      flush()
      query.processAllAvailable() // drain every spooled shard
    } finally {
      query.stop()
      // best-effort spool cleanup (shards are transient by design)
      Files.walk(spoolDir).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p))
    }
    lines
  }
}
