package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** R43: copy-on-write MERGE — content ≡ the plain Upsert over a full read,
  * untouched file paths carried verbatim (no rewrite), conservative
  * fallback on unclustered layouts, CAS-protected against racing writers. */
class SnapshotMergeSpec extends SparkSpec {
  import spark.implicits._
  import SnapshotTable._

  private def table(name: String, clustered: Boolean): String = {
    val t = graft.Scratch.fresh(name)
    val df = spark.range(8000L).select(col("id").as("k"),
      (col("id") % 13).as("g"), format_string("v%06d", col("id")).as("s"))
    val laid = if (clustered)
      df.repartitionByRange(16, col("k")).sortWithinPartitions("k")
    else df.repartition(16)
    commit(spark, t, laid)
    t
  }

  /** I/U/D changeset: update keys [1000,1099] (s -> "UPD"), delete
    * [2000,2049], insert 5 keys past the range. */
  private def changes(): DataFrame =
    spark.range(1000L, 1100L).select(col("id").as("k"), (col("id") % 13).as("g"),
        lit("UPD").as("s"), lit("U").as("op"))
      .unionByName(spark.range(2000L, 2050L).select(col("id").as("k"),
        (col("id") % 13).as("g"), lit("x").as("s"), lit("D").as("op")))
      .unionByName(spark.range(5L).select((col("id") + 100000L).as("k"),
        lit(0L).as("g"), lit("NEW").as("s"), lit("I").as("op")))

  private def content(df: DataFrame): Map[String, Int] =
    df.collect().map(_.toString).groupBy(identity).view.mapValues(_.length).toMap

  test("merge ≡ Upsert.applyChanges over a full read; most files untouched (R43)") {
    val t = table("merge_clustered", clustered = true)
    val before = manifestFilesOf(t, 1L)
    val expected = content(Upsert.applyChanges(read(spark, t, 1L), changes(), Seq("k")))
    merge(spark, t, changes(), Seq("k")) shouldBe 2L
    content(read(spark, t)) shouldBe expected
    val after = manifestFilesOf(t, 2L)
    val carried = after.toSet intersect before.toSet
    // [1000,1099] ∪ [2000,2049] spans ≤ 2 of 16 ~500-key files each
    assert(carried.size >= 12, s"only ${carried.size} of ${before.size} files carried")
    assert((after.toSet -- before.toSet).nonEmpty) // the rewritten + inserted files
  }

  test("unclustered layout: every file may hold a key, merge degrades to full rewrite — still exact (R43)") {
    val t = table("merge_hash", clustered = false)
    val before = manifestFilesOf(t, 1L)
    val expected = content(Upsert.applyChanges(read(spark, t, 1L), changes(), Seq("k")))
    merge(spark, t, changes(), Seq("k"))
    content(read(spark, t)) shouldBe expected
    (manifestFilesOf(t, 2L).toSet intersect before.toSet) shouldBe empty
  }

  test("wide changeset past the key-prune cap: bounded driver path, extrema pruning still skips disjoint files (R43 scale)") {
    // the 100 TB shape: more distinct change keys than the driver may
    // collect. With the cap forced tiny, pruning must switch to the
    // changeset's key EXTREMA — the answer stays exact AND files wholly
    // outside [1000, 1600) still carry into the next manifest verbatim.
    val t = table("merge_wide", clustered = true)
    val before = manifestFilesOf(t, 1L)
    val wide = spark.range(1000L, 1600L).select(col("id").as("k"),
      (col("id") % 13).as("g"), lit("UPD").as("s"), lit("U").as("op"))
    val expected = content(Upsert.applyChanges(read(spark, t, 1L), wide, Seq("k")))
    spark.conf.set("spark.graft.merge.keyPruneCap", "8") // 600 distinct keys >> 8
    try merge(spark, t, wide, Seq("k")) shouldBe 2L
    finally spark.conf.unset("spark.graft.merge.keyPruneCap")
    content(read(spark, t)) shouldBe expected
    val carried = manifestFilesOf(t, 2L).toSet intersect before.toSet
    // 16 range-clustered files over [0, 8000): only the ~2 spanning
    // [1000, 1600) may be rewritten
    assert(carried.size >= 12, s"only ${carried.size} of ${before.size} files carried")
  }

  test("wide changeset with I/U/D mixed stays exact under the extrema fallback (R43 scale)") {
    val t = table("merge_wide_iud", clustered = true)
    val expected = content(Upsert.applyChanges(read(spark, t, 1L), changes(), Seq("k")))
    spark.conf.set("spark.graft.merge.keyPruneCap", "4")
    try merge(spark, t, changes(), Seq("k"))
    finally spark.conf.unset("spark.graft.merge.keyPruneCap")
    content(read(spark, t)) shouldBe expected
  }

  test("skipping still works on the post-merge table; old version intact (R43×R42)") {
    val t = table("merge_stats", clustered = true)
    merge(spark, t, changes(), Seq("k"))
    val (kept, skipped) = prunedFiles(spark, t, col("k") >= 4000 && col("k") < 4300)
    assert(skipped.nonEmpty, "no skipping on merged table")
    readPruned(spark, t, col("k") === 1005L).select("s").as[String].collect().toSeq shouldBe Seq("UPD")
    read(spark, t, 1L).filter(col("k") === 1005L).select("s").as[String].head() shouldBe "v001005"
  }

  test("vacuum reclaims the dead rewritten files inside partially-referenced dirs (R43 storage bound)") {
    val t = table("merge_vacuum", clustered = true)
    val expected = content(Upsert.applyChanges(read(spark, t, 1L), changes(), Seq("k")))
    merge(spark, t, changes(), Seq("k"))
    val deadV1 = manifestFilesOf(t, 1L).toSet -- manifestFilesOf(t, 2L).toSet
    deadV1 should not be empty
    deadV1.foreach(f => assert(java.nio.file.Files.exists(java.nio.file.Paths.get(t, f))))
    vacuum(t, keepFrom = 2L)
    // the rewritten (dead) files are gone even though their commit dir
    // still holds files the Replace manifest carried
    deadV1.foreach(f => assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(t, f)), s"leaked $f"))
    content(read(spark, t)) shouldBe expected
  }

  test("a racing writer wins the CAS; the merge clobbers nothing (R43)") {
    val t = table("merge_race", clustered = true)
    intercept[ConcurrentCommitException] {
      merge(spark, t, changes(), Seq("k"), beforePublish = () =>
        commit(spark, t, Seq((1L, 1L, "solo")).toDF("k", "g", "s")))
    }
    latestVersion(t) shouldBe Some(2L)
    content(read(spark, t)) shouldBe Map("[1,1,solo]" -> 1)
  }

  private def manifestFilesOf(t: String, v: Long): Seq[String] = {
    val json = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(t, "_log").resolve(f"v$v%016d.json")), "UTF-8")
    "\"([^\"]*\\.parquet)\"".r.findAllMatchIn(json).map(_.group(1)).toSeq
  }
  test("strict merge rejects a schema-widening changeset loudly (R59 guard)") {
    val t = table("m_evolve_strict", clustered = true)
    val widened = Seq((1000L, 0L, "UPD", "extra", "U"))
      .toDF("k", "g", "s", "note", "op")
    intercept[Exception] {
      SnapshotTable.merge(spark, t, widened, Seq("k"))
    }
  }

  test("evolveSchema merge adds the new column; untouched files keep their physical schema (R59)") {
    val t = table("m_evolve", clustered = true)
    val widened = spark.range(1000L, 1010L).select(col("id").as("k"),
        (col("id") % 13).as("g"), lit("UPD").as("s"), lit("tagged").as("note"),
        lit("U").as("op"))
      .unionByName(Seq((200000L, 0L, "NEW", "fresh", "I"))
        .toDF("k", "g", "s", "note", "op"))
    SnapshotTable.merge(spark, t, widened, Seq("k"), evolveSchema = true)
    val out = SnapshotTable.read(spark, t, mergeSchema = true)
    out.columns.toSet shouldBe Set("k", "g", "s", "note")
    val byK = out.filter(col("k").isin(999L, 1000L, 200000L))
      .collect().map(r => r.getLong(0) -> (r.getString(2), Option(r.getString(3)))).toMap
    byK(1000L) shouldBe (("UPD", Some("tagged")))
    byK(200000L) shouldBe (("NEW", Some("fresh")))
    byK(999L) shouldBe (("v000999", None)) // survivor reads NULL through mergeSchema
    out.count() shouldBe 8001L
    // widening rewrote only the touched files: at least one survivor file
    // still carries the narrow 3-column physical schema
    val narrow = SnapshotTable.filesOf(t).exists { f =>
      spark.read.parquet(f).columns.toSet == Set("k", "g", "s")
    }
    narrow shouldBe true
    graft.operators.Caches.releaseAll()
  }
}
