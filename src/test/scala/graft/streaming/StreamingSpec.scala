package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming ⇔ batch equivalence (X1/X2): feed the same events through the
  * streaming operators via MemoryStream and through the batch forms, and
  * require identical results. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  // Two users; u1 has sessions {0,5,10}, {60,70}; u2 has {0}, {120}. The
  // final event at minute 600 pushes the watermark far past every session.
  private val fixture: Seq[EventStreams.Event] = Seq(
    EventStreams.Event(1, ts(0), 1, "click", 1.0),
    EventStreams.Event(2, ts(5), 1, "view", 2.0),
    EventStreams.Event(3, ts(10), 1, "click", 3.0),
    EventStreams.Event(4, ts(60), 1, "purchase", 10.0),
    EventStreams.Event(5, ts(70), 1, "click", 4.0),
    EventStreams.Event(6, ts(0), 2, "view", 5.0),
    EventStreams.Event(7, ts(120), 2, "click", 6.0),
    EventStreams.Event(8, ts(600), 3, "signup", 0.5))

  test("streaming windowed agg equals batch on the same events (X1)") {
    val input = MemoryStream[EventStreams.Event](spark)
    val streamed = EventStreams.windowedAggStream(input.toDF(), "1 hour", "10 minutes")
    val q = streamed.writeStream.format("memory").queryName("x1_stream")
      .outputMode("append").start()
    try {
      // batches follow event-time order: a watermark correctly drops
      // late-beyond-watermark rows, so the fixture must not deliver them
      input.addData(fixture.take(7))
      q.processAllAvailable()
      input.addData(fixture.drop(7))
      q.processAllAvailable()
      // close all windows: watermark must pass the last window's end
      input.addData(EventStreams.Event(99, ts(1500), 9, "click", 0.0))
      q.processAllAvailable()
      // the far-future event closes every fixture window; its own window
      // stays open and unemitted, so closed streaming windows == batch
      // windows over the fixture exactly
      val streamedRows = spark.table("x1_stream").collect().toSet
      val batchRows = EventStreams.windowedAgg(fixture.toDF(), "1 hour").collect().toSet
      streamedRows should not be empty
      streamedRows shouldBe batchRows
    } finally q.stop()
  }

  test("streaming dedup keeps one row per event_id across batches (X4)") {
    val input = MemoryStream[EventStreams.Event](spark)
    val deduped = EventStreams.dedupStream(input.toDF(), Seq("event_id"), watermark = "10 minutes")
    val q = deduped.writeStream.format("memory").queryName("x4_stream")
      .outputMode("append").start()
    try {
      input.addData(fixture.take(3))
      q.processAllAvailable()
      input.addData(fixture.take(3)) // exact redelivery
      q.processAllAvailable()
      input.addData(fixture(0).copy(value = 99.0)) // same id, new payload → dup
      q.processAllAvailable()
      val rows = spark.table("x4_stream").collect()
      rows.length shouldBe 3
      rows.map(_.getLong(0)).toSet shouldBe Set(1L, 2L, 3L)
      // first occurrence won: the redelivered payload was dropped
      rows.find(_.getLong(0) == 1L).get.getDouble(4) shouldBe 1.0
    } finally q.stop()
  }

  test("stream-static enrichment equals the batch join on the same events (X6)") {
    val dims = Seq((1L, "GOLD"), (2L, "SILVER")).toDF("d_user", "segment")
    val input = MemoryStream[EventStreams.Event](spark)
    val enriched = EventStreams.enrichStream(input.toDF(), dims, "user_id", "d_user")
      .select("event_id", "user_id", "segment")
    val q = enriched.writeStream.format("memory").queryName("x6_stream")
      .outputMode("append").start()
    try {
      input.addData(fixture.take(4))
      q.processAllAvailable()
      input.addData(fixture.drop(4))
      q.processAllAvailable()
      val streamed = spark.table("x6_stream").collect().toSet
      val batchDf = EventStreams.enrichStream(fixture.toDF(), dims, "user_id", "d_user")
        .select("event_id", "user_id", "segment")
      // the dim side broadcasts: the event side never shuffles
      batchDf.queryExecution.executedPlan.toString should include ("BroadcastHashJoin")
      val batch = batchDf.collect().toSet
      streamed should not be empty
      streamed shouldBe batch
      // left semantics: user 3 has no dim row and still comes through
      streamed.find(_.getLong(0) == 8L).get.isNullAt(2) shouldBe true
    } finally q.stop()
  }

  test("stream-stream interval join equals the batch join on the same events (X7)") {
    val purchases = MemoryStream[EventStreams.Event](spark)
    val clicks = MemoryStream[EventStreams.Event](spark)
    val joined = EventStreams.attributionJoin(
      purchases.toDF(), clicks.toDF(), lookback = "1 hour",
      purchaseWatermark = Some("2 hours"), clickWatermark = Some("2 hours"))
    val q = joined.writeStream.format("memory").queryName("x7_stream")
      .outputMode("append").start()
    val pFix = Seq(EventStreams.Event(10, ts(65), 1, "purchase", 10.0),
      EventStreams.Event(11, ts(200), 1, "purchase", 20.0),
      EventStreams.Event(12, ts(70), 2, "purchase", 30.0))
    val cFix = Seq(EventStreams.Event(1, ts(10), 1, "click", 0.0),  // in 10's window
      EventStreams.Event(2, ts(64), 1, "click", 0.0),               // in 10's window
      EventStreams.Event(3, ts(150), 1, "click", 0.0),              // in 11's window
      EventStreams.Event(4, ts(300), 1, "click", 0.0),              // after everything
      EventStreams.Event(5, ts(30), 2, "click", 0.0))               // in 12's window
    try {
      // batches respect event-time order: batch 1 tops out at ts(70), so the
      // global watermark stays at 0 and nothing in batch 2 arrives late (a
      // late-beyond-watermark click would be dropped — correct streaming
      // semantics, but not what this equivalence fixture exercises)
      purchases.addData(Seq(pFix(0), pFix(2)))
      clicks.addData(Seq(cFix(0), cFix(1), cFix(4)))
      q.processAllAvailable()
      purchases.addData(Seq(pFix(1))); clicks.addData(Seq(cFix(2), cFix(3)))
      q.processAllAvailable()
      val streamed = spark.table("x7_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val batch = EventStreams.attributionJoin(pFix.toDF(), cFix.toDF()).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      streamed shouldBe batch
      streamed shouldBe Set((10L, 1L), (10L, 2L), (11L, 3L), (12L, 5L))
    } finally q.stop()
  }

  test("left-outer stream-stream join emits unattributed purchases as null rows (X10)") {
    val purchases = MemoryStream[EventStreams.Event](spark)
    val clicks = MemoryStream[EventStreams.Event](spark)
    val joined = EventStreams.attributionJoinOuter(
      purchases.toDF(), clicks.toDF(), lookback = "1 hour",
      purchaseWatermark = Some("2 hours"), clickWatermark = Some("2 hours"))
    val q = joined.writeStream.format("memory").queryName("x10_stream")
      .outputMode("append").start()
    val pFix = Seq(
      EventStreams.Event(10, ts(65), 1, "purchase", 10.0),   // has clicks
      EventStreams.Event(13, ts(80), 3, "purchase", 40.0),   // NO click → null row
      EventStreams.Event(99, ts(1000), 9, "purchase", 1.0))  // watermark flush
    val cFix = Seq(
      EventStreams.Event(2, ts(64), 1, "click", 0.0),
      EventStreams.Event(9, ts(1000), 9, "click", 0.0))
    try {
      purchases.addData(Seq(pFix(0), pFix(1)))
      clicks.addData(Seq(cFix(0)))
      q.processAllAvailable()
      // late flush batch pushes the watermark far past purchase 13, so its
      // null-padded row must be emitted (the outer-join expiry mechanism)
      purchases.addData(Seq(pFix(2))); clicks.addData(Seq(cFix(1)))
      q.processAllAvailable()
      purchases.addData(Seq()); clicks.addData(Seq())
      q.processAllAvailable()
      def pairs(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
        (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      val streamed = pairs(spark.table("x10_stream").collect())
      val batch = pairs(EventStreams.attributionJoinOuter(pFix.toDF(), cFix.toDF()).collect())
      streamed shouldBe batch
      streamed shouldBe Set((10L, 2L), (13L, -1L), (99L, 9L))
    } finally q.stop()
  }

  test("streaming near-dedup drops signature-equal docs, keeps first (X5)") {
    import StreamingSpec.Doc
    val docs = Seq(
      Doc(1, "the quick brown fox jumps over the lazy dog", ts(0)),
      Doc(2, "an entirely different document about spark", ts(1)),
      // token permutation of doc 1 — identical SimHash (bag function),
      // different text: exact-id dedup would keep it, near-dedup drops it
      Doc(3, "dog lazy the over jumps fox brown quick the", ts(2)),
      Doc(4, "the quick brown fox jumps over the lazy dog", ts(3)), // exact re-ingest
      Doc(5, "yet another unrelated piece of text entirely", ts(4)))
    val input = MemoryStream[Doc](spark)
    val q = EventStreams.nearDedupStream(input.toDF(), "text", "ts", "10 minutes")
      .writeStream.format("memory").queryName("x5_stream")
      .outputMode("append").start()
    try {
      input.addData(docs.take(3))
      q.processAllAvailable()
      input.addData(docs.drop(3))
      q.processAllAvailable()
      val kept = spark.table("x5_stream").collect().map(_.getLong(0)).toSet
      kept shouldBe Set(1L, 2L, 5L)
      // equals the batch keep-first-per-signature form (the x5 gate's shape)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("__sig").orderBy("doc_id")
      val batchKept = docs.toDF()
        .withColumn("__sig", graft.operators.Dedup.simhash(col("text")))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .collect().map(_.getLong(0)).toSet
      kept shouldBe batchKept
    } finally q.stop()
  }

  test("cdcMerge is last-writer-wins by seq, independent of batch split/order (X8)") {
    val empty = Seq.empty[(Long, Double, String, Long)]
      .toDF("k", "price", "op", "seq")
    val b1 = Seq((1L, 10.0, "I", 1L), (2L, 20.0, "I", 1L), (3L, 30.0, "I", 1L))
      .toDF("k", "price", "op", "seq")
    val b2 = Seq((1L, 11.0, "U", 2L), (3L, 0.0, "D", 2L)).toDF("k", "price", "op", "seq")
    val b3 = Seq((2L, 22.0, "U", 3L), (3L, 33.0, "U", 1L)) // stale seq-1 update for deleted key
      .toDF("k", "price", "op", "seq")
    def collectState(batches: Seq[org.apache.spark.sql.DataFrame]) = {
      val st = batches.foldLeft(empty)((acc, b) =>
        EventStreams.cdcMerge(acc, b, Seq("k"), "seq"))
      st.filter(col("op") =!= "D").select("k", "price")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    }
    val inOrder = collectState(Seq(b1, b2, b3))
    // key 3's seq-1 update arrives AFTER its seq-2 delete and must lose
    inOrder shouldBe Set((1L, 11.0), (2L, 22.0))
    // any batch order or split yields the same state
    collectState(Seq(b3, b1, b2)) shouldBe inOrder
    collectState(Seq(b1.unionByName(b2).unionByName(b3))) shouldBe inOrder
  }

  test("cdcMerge breaks (key, seq) ties deterministically (X8)") {
    // a source violating the monotone-seq contract: same key, same seq, two
    // different images — the survivor must be the same under either arrival
    // order (content-hash tiebreak), not whichever reached the heap first
    val empty = Seq.empty[(Long, Double, String, Long)].toDF("k", "price", "op", "seq")
    val img1 = Seq((1L, 10.0, "U", 5L)).toDF("k", "price", "op", "seq")
    val img2 = Seq((1L, 99.0, "U", 5L)).toDF("k", "price", "op", "seq")
    def survivor(first: org.apache.spark.sql.DataFrame, second: org.apache.spark.sql.DataFrame) =
      EventStreams.cdcMerge(EventStreams.cdcMerge(empty, first, Seq("k"), "seq"),
          second, Seq("k"), "seq")
        .select("price").collect().map(_.getDouble(0)).toSeq
    survivor(img1, img2) shouldBe survivor(img2, img1)
  }

  test("cdcApplyBatch rewrites only touched buckets and replays idempotently (X8)") {
    val stateDir = graft.Scratch.fresh("spec_x8_state")
    val nBuckets = 8
    // batch 0: 64 keys spread across every bucket
    val b0 = (1L to 64L).map(k => (k, k * 1.0, "I", 1L)).toDF("k", "price", "op", "seq")
    EventStreams.cdcApplyBatch(spark, b0, 0L, Seq("k"), "seq", stateDir, nBuckets)
    val v0Buckets = new java.io.File(s"$stateDir/v0").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("__b=")).map(_.getName).toSet
    v0Buckets.size shouldBe nBuckets
    // batch 1: ONE key → exactly one bucket dir under v1, not a full rewrite
    val b1 = Seq((7L, 777.0, "U", 2L)).toDF("k", "price", "op", "seq")
    EventStreams.cdcApplyBatch(spark, b1, 1L, Seq("k"), "seq", stateDir, nBuckets)
    val v1Buckets = new java.io.File(s"$stateDir/v1").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("__b=")).map(_.getName).toSet
    v1Buckets.size shouldBe 1
    def state() = EventStreams.cdcCurrent(spark, stateDir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val afterB1 = state()
    afterB1(7L) shouldBe 777.0
    afterB1.size shouldBe 64
    // replay of batch 1 (foreachBatch is at-least-once): the merge base is
    // the newest version STRICTLY BELOW the batch id, so re-running the same
    // (id, data) must neither fail ("cannot overwrite a path being read
    // from") nor change the state
    EventStreams.cdcApplyBatch(spark, b1, 1L, Seq("k"), "seq", stateDir, nBuckets)
    state() shouldBe afterB1
    // untouched buckets keep serving from v0: a key in another bucket
    // still reads its batch-0 image
    afterB1(8L) shouldBe 8.0
    // compaction folds the version chain into one dir without changing the
    // live state; later batches keep merging against the compacted base
    val newV = EventStreams.cdcCompact(spark, stateDir, Seq("k"), nBuckets)
    val versions = new java.io.File(stateDir).listFiles()
      .filter(f => f.isDirectory && f.getName.matches("v\\d+")).map(_.getName).toSeq
    versions shouldBe Seq(s"v$newV")
    state() shouldBe afterB1
    val b2 = Seq((7L, 7777.0, "U", 3L)).toDF("k", "price", "op", "seq")
    EventStreams.cdcApplyBatch(spark, b2, newV + 1, Seq("k"), "seq", stateDir, nBuckets)
    state()(7L) shouldBe 7777.0
    // the bucket count is a persisted contract of the state dir: applying
    // or compacting with a different count must fail loudly, not silently
    // miss state rows
    an[IllegalArgumentException] should be thrownBy
      EventStreams.cdcApplyBatch(spark, b2, newV + 2, Seq("k"), "seq", stateDir, nBuckets * 2)
    an[IllegalArgumentException] should be thrownBy
      EventStreams.cdcCompact(spark, stateDir, Seq("k"), nBuckets * 2)
  }

  test("streaming curation filters low-quality docs before dedup state, then near-dedups (X11)") {
    import StreamingSpec.Doc
    val longText = "the quick brown fox jumps over the lazy dog and keeps running " +
      "through the quiet green field toward the distant hills every single morning"
    val docs = Seq(
      Doc(1, longText, ts(0)),
      Doc(2, "too short", ts(1)),                       // fails quality → never in state
      Doc(3, longText.split(" ").reverse.mkString(" "), ts(2)), // near-dup of 1 → dropped
      Doc(4, "!!!???!!!" * 20, ts(3)),                  // punct spam → filtered
      Doc(5, longText + " with a genuinely different tail section appended here", ts(4)))
    val input = MemoryStream[Doc](spark)
    val q = EventStreams.curationStream(input.toDF(), "text", "ts", "10 minutes")
      .writeStream.format("memory").queryName("x11_stream")
      .outputMode("append").start()
    try {
      input.addData(docs.take(3))
      q.processAllAvailable()
      input.addData(docs.drop(3))
      q.processAllAvailable()
      val kept = spark.table("x11_stream").collect().map(_.getLong(0)).toSet
      kept shouldBe Set(1L, 5L)
      // equals the batch form: quality filter then keep-first-per-signature
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("__sig").orderBy("doc_id")
      val batchKept = docs.toDF()
        .filter(graft.operators.TextAnalysis.isQuality(col("text")))
        .withColumn("__sig", graft.operators.Dedup.simhash(col("text")))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .collect().map(_.getLong(0)).toSet
      kept shouldBe batchKept
    } finally q.stop()
  }

  test("ivmApplyBatch maintains the rollup across batches and replays idempotently (X9)") {
    val stateDir = graft.Scratch.fresh("spec_x9_state")
    def dec(s: String) = new java.math.BigDecimal(s)
    def asDec(df: org.apache.spark.sql.DataFrame) = df.select(col("k"),
      col("v").cast(org.apache.spark.sql.types.DataTypes.createDecimalType(18, 2)).as("v"),
      col("op"))
    // batch 0: initial inserts into two groups
    val b0 = asDec(Seq(("A", "1.00", "I"), ("A", "2.00", "I"), ("B", "5.00", "I"))
      .toDF("k", "v", "op"))
    EventStreams.ivmApplyBatch(spark, b0, 0L, Seq("k"), "op", Seq("v"), stateDir)
    def state() = EventStreams.ivmCurrent(spark, stateDir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDecimal(2).stripTrailingZeros()))).toMap
    state() shouldBe Map("A" -> ((2L, dec("3"))), "B" -> ((1L, dec("5"))))
    // batch 1: update one A row (D-old + I-new), delete B entirely
    val b1 = asDec(Seq(("A", "2.00", "D"), ("A", "2.50", "I"), ("B", "5.00", "D"))
      .toDF("k", "v", "op"))
    EventStreams.ivmApplyBatch(spark, b1, 1L, Seq("k"), "op", Seq("v"), stateDir)
    val after1 = state()
    after1 shouldBe Map("A" -> ((2L, dec("3.5"))))
    // at-least-once replay of batch 1: merge base is strictly below the
    // batch id, so the rewrite is byte-identical, not double-applied
    EventStreams.ivmApplyBatch(spark, b1, 1L, Seq("k"), "op", Seq("v"), stateDir)
    state() shouldBe after1
    // versions older than id-1 are pruned; the live read keeps working
    val b2 = asDec(Seq(("C", "9.00", "I")).toDF("k", "v", "op"))
    EventStreams.ivmApplyBatch(spark, b2, 2L, Seq("k"), "op", Seq("v"), stateDir)
    new java.io.File(stateDir).listFiles()
      .count(f => f.isDirectory && f.getName.matches("v\\d+")) should be <= 2
    state() shouldBe Map("A" -> ((2L, dec("3.5"))), "C" -> ((1L, dec("9"))))
  }

  test("session numbering continues after all sessions close (X2 counter)") {
    val input = MemoryStream[EventStreams.Event](spark)
    val sessions = EventStreams.sessionizeStream(spark, input.toDF(), gapMinutes = 30, watermark = "1 minute")
    val q = sessions.writeStream.format("memory").queryName("x2_seq_stream")
      .outputMode("append").start()
    try {
      input.addData(EventStreams.Event(1, ts(0), 7, "click", 1.0))
      q.processAllAvailable()
      // other-user event pushes the watermark; user 7's session closes via
      // TIMEOUT (no user-7 events in flight), which used to drop the counter
      input.addData(EventStreams.Event(2, ts(600), 9, "click", 0.0))
      q.processAllAvailable()
      input.addData(EventStreams.Event(3, ts(1200), 7, "click", 2.0))
      q.processAllAvailable()
      input.addData(EventStreams.Event(4, ts(2000), 9, "click", 0.0))
      q.processAllAvailable()
      val seqs = spark.table("x2_seq_stream")
        .filter(col("user_id") === 7).select("session_seq")
        .collect().map(_.getLong(0)).sorted.toSeq
      seqs shouldBe Seq(1L, 2L) // cumulative, matching batch numbering
    } finally q.stop()
  }

  test("out-of-order events within the watermark extend and bridge open sessions (X2)") {
    val input = MemoryStream[EventStreams.Event](spark)
    val sessions = EventStreams.sessionizeStream(spark, input.toDF(), gapMinutes = 30, watermark = "2 hours")
    val q = sessions.writeStream.format("memory").queryName("x2_ooo_stream")
      .outputMode("append").start()
    try {
      input.addData(EventStreams.Event(1, ts(50), 42, "click", 1.0))
      q.processAllAvailable()
      // late (but in-watermark) event BEFORE the open session: > gap away,
      // so it opens an earlier session
      input.addData(EventStreams.Event(2, ts(10), 42, "click", 2.0))
      q.processAllAvailable()
      // bridging event: within gap of both 10 and 50 — everything merges
      input.addData(EventStreams.Event(3, ts(30), 42, "click", 4.0))
      q.processAllAvailable()
      // far-future other-user event closes user 42's merged session
      input.addData(EventStreams.Event(9, ts(600), 9, "click", 0.0))
      q.processAllAvailable()
      input.addData(EventStreams.Event(10, ts(1200), 9, "click", 0.0))
      q.processAllAvailable()
      val rows = spark.table("x2_ooo_stream").filter(col("user_id") === 42).collect()
      rows.length shouldBe 1 // one merged session, not three
      rows.head.getLong(1) shouldBe 1L            // session_seq
      rows.head.getLong(2) shouldBe 3L            // n_events
      rows.head.getTimestamp(3) shouldBe ts(10)   // session_start
      rows.head.getTimestamp(4) shouldBe ts(50)   // session_end
      rows.head.getDecimal(5).doubleValue() shouldBe 7.0 // total_value
    } finally q.stop()
  }

  test("streaming sessionization equals batch sessionization (X2)") {
    val input = MemoryStream[EventStreams.Event](spark)
    val sessions = EventStreams.sessionizeStream(spark, input.toDF(), gapMinutes = 30, watermark = "1 minute")
    val q = sessions.writeStream.format("memory").queryName("x2_stream")
      .outputMode("append").start()
    try {
      input.addData(fixture.take(7))
      q.processAllAvailable()
      input.addData(fixture.drop(7))
      q.processAllAvailable()
      input.addData(EventStreams.Event(100, ts(3000), 9, "click", 0.0))
      q.processAllAvailable()
      input.addData(EventStreams.Event(101, ts(3001), 9, "click", 0.0))
      q.processAllAvailable()

      val streamed = spark.table("x2_stream")
        .select("user_id", "session_seq", "n_events", "session_start", "session_end", "total_value")
        .collect().toSet
      val batch = EventStreams.sessionizeBatch(fixture.toDF(), 30)
        .select(col("user_id"), col("session_seq"), col("n_events"),
          col("session_start"), col("session_end"),
          col("total_value").cast("decimal(20,2)"))
        .collect().toSet

      val batchComparable = batch.map(r => Row(r.getLong(0), r.getLong(1), r.getLong(2),
        r.getTimestamp(3), r.getTimestamp(4), r.getDecimal(5).stripTrailingZeros()))
      val streamComparable = streamed.map(r => Row(r.getLong(0), r.getLong(1), r.getLong(2),
        r.getTimestamp(3), r.getTimestamp(4), r.getDecimal(5).stripTrailingZeros()))
      streamComparable shouldBe batchComparable
    } finally q.stop()
  }
}

object StreamingSpec {
  /** Top-level so the derived Encoder is stable (a method-local case class
    * has no TypeTag usable by MemoryStream). */
  case class Doc(doc_id: Long, text: String, ts: java.sql.Timestamp)
}
