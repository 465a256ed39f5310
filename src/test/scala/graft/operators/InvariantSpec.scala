package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized cross-operator invariants (seeded — deterministic in CI).
  * Each test generates several random fixtures but runs only a handful of
  * Spark jobs, so the suite stays fast while covering input shapes the
  * hand-written specs don't.
  */
class InvariantSpec extends SparkSpec {
  import spark.implicits._

  test("pointInInterval ≡ naive join over random interval/point/bin shapes (R30)") {
    for (seed <- Seq(1, 22, 333)) {
      val rnd = new scala.util.Random(seed)
      val intervals = (0 until 60).map { i =>
        val s = rnd.nextLong() % 1000
        (i.toLong, s, s + rnd.nextInt(80))
      }.toDF("iid", "s", "e")
      val points = (0 until 300).map(p => (1000L + p, rnd.nextLong() % 1100)).toDF("pid", "p")
      val bin = 1L + rnd.nextInt(100)
      val got = RangeJoin.pointInInterval(intervals, points, "s", "e", "p", bin)
        .select("iid", "pid").as[(Long, Long)].collect().sorted.toSeq
      val naive = intervals.join(points, col("p") >= col("s") && col("p") <= col("e"))
        .select("iid", "pid").as[(Long, Long)].collect().sorted.toSeq
      withClue(s"seed=$seed bin=$bin: ") { got shouldBe naive }
    }
  }

  test("cdcMerge is batch-split independent: folding random splits equals one merge (X8)") {
    val rnd = new scala.util.Random(7)
    // 40 keys, up to 6 change images each with distinct seqs
    val changes = for {
      k <- 0L until 40L
      s <- 1L to (1 + rnd.nextInt(6)).toLong
    } yield (k, s, rnd.nextInt(1000).toDouble,
      if (rnd.nextInt(5) == 0) "D" else "U")
    def df(rows: Seq[(Long, Long, Double, String)]) =
      rows.toDF("k", "seq", "v", "op")
    val oneShot = graft.streaming.EventStreams
      .cdcMerge(df(changes).limit(0), df(changes), Seq("k"), "seq")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3))).toSet
    for (seed <- Seq(11, 99)) {
      val r2 = new scala.util.Random(seed)
      val shuffled = r2.shuffle(changes)
      val (b1, rest) = shuffled.splitAt(shuffled.size / 3)
      val (b2, b3) = rest.splitAt(rest.size / 2)
      val folded = Seq(b1, b2, b3).foldLeft(df(changes).limit(0)) { (state, batch) =>
        graft.streaming.EventStreams.cdcMerge(state, df(batch), Seq("k"), "seq")
      }.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3))).toSet
      withClue(s"seed=$seed: ") { folded shouldBe oneShot }
    }
  }

  test("assignSplits: every id gets exactly one split and fractions track thresholds (T6)") {
    val spec = Seq("train" -> 0.7, "val" -> 0.2, "test" -> 0.1)
    val ids = (0L until 20000L).toDF("id")
    val counts = Sampling.assignSplits(ids, "id", spec)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    counts.values.sum shouldBe 20000L
    counts("train").toDouble / 20000 shouldBe 0.7 +- 0.02
    counts("val").toDouble / 20000 shouldBe 0.2 +- 0.02
    counts("test").toDouble / 20000 shouldBe 0.1 +- 0.02
  }

  test("Scd2.fromChanges equals a per-key fold reference on random feeds (R34)") {
    for (seed <- Seq(3, 17)) {
      val rnd = new scala.util.Random(seed)
      val changes = (for {
        k <- 0L until 30L
        (s, i) <- rnd.shuffle((1L to 8L).toList).take(1 + rnd.nextInt(5)).sorted.zipWithIndex
      } yield (k, s, s"v${k}_$i",
        if (rnd.nextInt(4) == 0) "D" else if (i == 0) "I" else "U")).toSeq
      val got = Scd2.fromChanges(changes.toDF("k", "seq", "attr", "op"),
          Seq("k"), "seq")
        .select("k", "attr", "valid_from", "valid_to", "is_current")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4))).toSet
      // reference: per key, sort by seq; each non-D row's interval closes at
      // the NEXT change's seq (any op), open if none
      val expect = changes.groupBy(_._1).flatMap { case (_, g) =>
        val sorted = g.sortBy(_._2)
        sorted.zipWithIndex.collect {
          case ((k, s, a, op), i) if op != "D" =>
            val to = if (i + 1 < sorted.length) sorted(i + 1)._2 else -1L
            (k, a, s, to, to == -1L)
        }
      }.toSet
      withClue(s"seed=$seed: ") { got shouldBe expect }
    }
  }

  test("decontaminateNear equals brute-force cross-set exact Jaccard on random corpora (D9)") {
    val rnd = new scala.util.Random(29)
    val vocab = ('a' to 'z').map(_.toString)
    def doc() = (0 until (6 + rnd.nextInt(10))).map(_ => vocab(rnd.nextInt(12))).mkString(" ")
    val train = (0L until 40L).map(i => (i, doc())).toDF("id", "text")
    val evalRows = (0 until 8).map(i => (100L + i, doc()))
    val eval = evalRows.toDF("id", "text")
    def shingles(t: String): Set[Seq[String]] = {
      val toks = t.toLowerCase.trim.split("\\s+").toSeq
      if (toks.length < 3) Set(toks) else toks.sliding(3).toSet
    }
    val evalSets = evalRows.map { case (_, t) => shingles(t) }
    val expect = train.as[(Long, String)].collect().collect {
      case (id, t) if evalSets.exists { e =>
        val s = shingles(t); val i = (s intersect e).size
        i.toDouble / (s.size + e.size - i) >= 0.5
      } => id
    }.toSet
    val got = Dedup.decontaminateNear(train, eval, "text", "id",
      shingleK = 3, threshold = 0.5).as[Long].collect().toSet
    got shouldBe expect
  }

  test("PQ codes are invariant to input partitioning (S5)") {
    val rnd = new scala.util.Random(13)
    val vecs = (0 until 150).map(i => (i.toLong, Array.fill(16)(rnd.nextGaussian())))
      .toDF("id", "v")
    val cb = ProductQuantizer.train(vecs, "v", m = 4, k = 8, iters = 3)
    def codes(df: org.apache.spark.sql.DataFrame) =
      ProductQuantizer.encode(df, "v", cb)
        .select("id", "pq_codes").collect()
        .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    codes(vecs.repartition(11)) shouldBe codes(vecs.coalesce(1))
  }

  test("TopK.perGroupOrdered equals the sort-based reference on random data (P1)") {
    for (seed <- Seq(5, 55)) {
      val rnd = new scala.util.Random(seed)
      val rows = (0 until 2000).map(i =>
        (s"g${rnd.nextInt(13)}", rnd.nextInt(500).toLong, i.toLong))
      val df = rows.toDF("g", "v", "id")
      val k = 1 + rnd.nextInt(5)
      val got = graft.plans.TopK.perGroupOrdered(df, Seq("g"),
          Seq("v" -> false, "id" -> true), k)
        .select("g", "v", "id").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val expect = rows.groupBy(_._1).flatMap { case (_, g) =>
        g.sortBy(t => (-t._2, t._3)).take(k)
      }.toSet
      withClue(s"seed=$seed k=$k: ") { got shouldBe expect }
    }
  }
}
