package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ids = (0L until 10000L).toDF("id")

  test("hash split is deterministic, disjoint, and ~proportional (T6)") {
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val a = Sampling.assignSplits(ids, "id", splits).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Sampling.assignSplits(ids.repartition(7), "id", splits).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    a shouldBe b // partitioning-independent — no RNG state anywhere
    val counts = a.values.groupBy(identity).view.mapValues(_.size).toMap
    counts("train").toDouble / 10000 shouldBe 0.8 +- 0.02
    counts("val").toDouble / 10000 shouldBe 0.1 +- 0.02
    counts("test").toDouble / 10000 shouldBe 0.1 +- 0.02
  }

  test("stratifiedSample takes exactly n per stratum, deterministically (T7)") {
    val df = (0L until 1000L).map(i => (i, s"lang${i % 4}")).toDF("id", "lang")
    val a = Sampling.stratifiedSample(df, "lang", "id", 10)
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    a.groupBy(_._1).values.foreach(_.size shouldBe 10)
    // partitioning-independent (pure function of the data)
    val b = Sampling.stratifiedSample(df.repartition(13), "lang", "id", 10)
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    b shouldBe a
    // matches the window-function reference formulation
    val ref = df.withColumn("__u", md5(col("id").cast("string")))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("lang")
          .orderBy(col("__u"), col("id"))))
      .filter(col("rk") <= 10)
      .select("lang", "id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    a shouldBe ref
    // small strata yield all their rows
    val tiny = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("id", "lang")
    Sampling.stratifiedSample(tiny, "lang", "id", 10).count() shouldBe 3
  }

  test("temperatureResample rebalances by sqrt weights, deterministically (T11)") {
    // sources of very different sizes: 6400 / 1600 / 400 rows → integer
    // sqrt weights 80 / 40 / 20 → quotas 140·(4/7, 2/7, 1/7) = 80/40/20,
    // flattening the 16:4:1 corpus ratio to 4:2:1
    val df = ((0L until 6400L).map((_, "big")) ++
      (6400L until 8000L).map((_, "mid")) ++
      (8000L until 8400L).map((_, "small"))).toDF("id", "src")
    val out = Sampling.temperatureResample(df, "src", "id", targetTotal = 140)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val bySrc = out.groupBy(_._2).view.mapValues(_.length).toMap
    bySrc shouldBe Map("big" -> 80, "mid" -> 40, "small" -> 20)
    // pure function of the data — partitioning cannot change the selection
    val again = Sampling.temperatureResample(df.repartition(11), "src", "id", 140)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    again.toSet shouldBe out.toSet
    // selection within a stratum is md5-order: the picked set matches the
    // window reference formulation
    val ref = df.withColumn("__u", md5(col("id").cast("string")))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("src")
          .orderBy(col("__u"), col("id"))))
      .filter((col("src") === "big" && col("rk") <= 80) ||
        (col("src") === "mid" && col("rk") <= 40) ||
        (col("src") === "small" && col("rk") <= 20))
      .select("id", "src")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    out.toSet shouldBe ref
  }

  test("temperatureResample carries no broadcast hint on the picked side (T11 scale shape)") {
    // the picked-id set is targetTotal-sized — billions of rows in a real
    // resample — so the operator must not force a broadcast; AQE stays free
    // to choose at runtime (hints live in the analyzed logical plan)
    val df = (0L until 1000L).map(i => (i, s"s${i % 3}")).toDF("id", "src")
    val hints = Sampling.temperatureResample(df, "src", "id", targetTotal = 100)
      .queryExecution.analyzed.collect {
        case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
      }
    hints shouldBe empty
  }

  test("temperatureResample edge cases: empty input, all-zero quotas, cross-strata ids (T11)") {
    val empty = Seq.empty[(Long, String)].toDF("id", "src")
    Sampling.temperatureResample(empty, "src", "id", 100).count() shouldBe 0
    // many small strata with a tiny target: every quota floors to 0 — the
    // result is empty, not a k=0 heap failure
    val many = (0L until 90L).map(i => (i, s"s${i % 9}")).toDF("id", "src")
    Sampling.temperatureResample(many, "src", "id", targetTotal = 1).count() shouldBe 0
    // ids shared ACROSS strata: selection keys on (stratum, id), so stratum
    // b re-using stratum a's ids cannot pull extra a-rows through the join
    val a = (0L until 100L).map((_, "a"))
    val b = (0L until 4L).map((_, "b")) // same ids as a's first four
    val dup = (a ++ b).toDF("id", "src")
    // weights: w_a = 10, w_b = 2, Σ = 12; target 12 → quotas 10 and 2
    val out = Sampling.temperatureResample(dup, "src", "id", targetTotal = 12)
      .collect().map(r => (r.getString(1), r.getLong(0)))
    out.count(_._1 == "a") shouldBe 10
    out.count(_._1 == "b") shouldBe 2
    // column order of the input is preserved
    Sampling.temperatureResample(dup, "src", "id", 12).columns shouldBe Array("id", "src")
  }

  test("hashSample keeps a stable ~fraction and is a subset relation (T6)") {
    val s10 = Sampling.hashSample(ids, "id", 0.1).as[Long].collect().toSet
    val s20 = Sampling.hashSample(ids, "id", 0.2).as[Long].collect().toSet
    s10.size.toDouble / 10000 shouldBe 0.1 +- 0.02
    // threshold sampling is monotone: the 10% sample is inside the 20%
    s10.subsetOf(s20) shouldBe true
    // re-evaluation returns the identical subset
    Sampling.hashSample(ids, "id", 0.1).as[Long].collect().toSet shouldBe s10
  }

  test("clusterSafeSplits: cluster members share one split; singletons match T6 on their component (T15)") {
    val docs = (1L to 50L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 20L)).toDF("id_a", "id_b")
    val spec = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = Sampling.clusterSafeSplits(docs, "id", pairs, spec)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    out.size shouldBe 50
    // chain 1-2-3 is one cluster: shared canonical label, shared split
    out(1L)._1 shouldBe 1L
    out(2L)._1 shouldBe 1L
    out(3L)._1 shouldBe 1L
    out(2L)._2 shouldBe out(1L)._2
    out(3L)._2 shouldBe out(1L)._2
    out(20L)._1 shouldBe 10L
    out(20L)._2 shouldBe out(10L)._2
    // singletons keep T6's exact per-id assignment (component = own id)
    val t6 = Sampling.assignSplits(docs, "id", spec)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    (4L to 9L).foreach { i =>
      out(i)._1 shouldBe i
      out(i)._2 shouldBe t6(i)
    }
  }

  test("ontologySafeSplits: root selection, group-tier components, singleton fallback (P6)") {
    import spark.implicits._
    // ontology:      1
    //             2     3
    //           4   5     7        (6 intentionally absent: 7's only child)
    //          8 9 10      14      group tier = {4, 5, 99}
    val edges = Seq((2L,1L),(3L,1L),(4L,2L),(5L,2L),(7L,3L),
      (8L,4L),(9L,4L),(10L,5L),(14L,7L)).toDF("child", "parent")
    val groups = Seq(4L, 5L, 99L).toDF("node")
    val docs = Seq(
      (100L, 8L), (101L, 9L),   // leaves under group 4
      (102L, 10L),              // leaf under group 5
      (103L, 4L),               // topic IS a group node -> itself
      (104L, 5L),
      (105L, 2L),               // topic == root -> excluded (`+` semantics)
      (106L, 14L),              // under root 3, not root 2 -> excluded
      (107L, 42L)               // not in the ontology -> excluded
    ).toDF("doc_id", "topic")
    val out = Sampling.ontologySafeSplits(docs, "topic", edges, root = 2L,
        groups, Seq("train" -> 0.8, "val" -> 0.2))
      .select("doc_id", "component", "split")
      .as[(Long, Long, String)].collect().sortBy(_._1)
    out.map(_._1).toSeq shouldBe Seq(100L, 101L, 102L, 103L, 104L)
    val comp = out.map(r => r._1 -> r._2).toMap
    comp(100L) shouldBe 4L; comp(101L) shouldBe 4L   // same subtree
    comp(102L) shouldBe 5L
    comp(103L) shouldBe 4L; comp(104L) shouldBe 5L   // ancestor-or-self
    // same component -> same split, and split ≡ T6 assignment on component
    val splits = out.map(r => r._2 -> r._3).distinct.groupBy(_._1)
    splits.values.foreach(_.length shouldBe 1)
    val expected = Sampling.assignSplits(
        Seq(4L, 5L).toDF("component"), "component", Seq("train" -> 0.8, "val" -> 0.2))
      .as[(Long, String)].collect().toMap
    out.foreach { case (_, c, sp) => sp shouldBe expected(c) }
    // singleton fallback: with an empty group tier every topic keys on itself
    val solo = Sampling.ontologySafeSplits(docs, "topic", edges, root = 2L,
        Seq.empty[Long].toDF("node"), Seq("train" -> 0.8, "val" -> 0.2))
      .select("doc_id", "component").as[(Long, Long)].collect().toMap
    solo shouldBe Map(100L -> 8L, 101L -> 9L, 102L -> 10L, 103L -> 4L, 104L -> 5L)
  }

  test("ontologySafeSplits: corpus-side joins broadcast at runtime via AQE, unhinted (P6 scale shape)") {
    val dir = "/root/testdata/sf0.01"
    assume(new java.io.File(dir).exists(), "testdata not present")
    // the operator carries NO static broadcast hint (a category tier can
    // outgrow the budget — the t11 rule); the category-sized sides must
    // instead convert to broadcast at runtime once AQE sees their size
    val df = graft.SparkEntry.queries("p6_ontology_curation")(spark, dir)
    df.collect()
    // adaptive toString appends the pre-AQE "== Initial Plan ==" (which
    // rightly still says SortMergeJoin) — assert on the final plan only
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    withClue(s"executed final plan:\n$plan\n") {
      plan should include("BroadcastHashJoin")
      plan should not include "SortMergeJoin"
    }
  }

  test("global shuffle: reproducible, partitioning-invariant, seed-sensitive, totally ordered (T17)") {
    import spark.implicits._
    val base = spark.range(0, 1000).select(col("id").as("doc_id"))
    def order(input: org.apache.spark.sql.DataFrame, seed: Long): Seq[Long] =
      // collect() preserves partition order and within-partition order, so
      // with range partitioning + local sort this IS the total order
      Sampling.globalShuffle(input, "doc_id", seed).select("doc_id")
        .as[Long].collect().toSeq
    val a = order(base.repartition(3), 7L)
    val b = order(base.repartition(11), 7L)
    a shouldBe b                       // input partitioning is irrelevant
    a should not be order(base, 8L)    // next epoch = new order
    a.sorted shouldBe (0L until 1000L) // a permutation, nothing lost
    // and it matches an in-memory sort by the same key — the order is the
    // key, materialization just arranges it
    val expected = (0L until 1000L)
      .sortBy(i => java.security.MessageDigest.getInstance("MD5")
        .digest(s"7:$i".getBytes("UTF-8")).map("%02x".format(_)).mkString)
    a shouldBe expected
    // total order ACROSS partitions: every partition's max key precedes the
    // next partition's min key (sequential file readers see shuffle order)
    val bounds = Sampling.globalShuffle(base, "doc_id", 7L)
      .select("shuffle_key").rdd
      .mapPartitionsWithIndex { (i, it) =>
        val keys = it.map(_.getString(0)).toSeq
        if (keys.isEmpty) Iterator.empty
        else Iterator((i, keys.min, keys.max))
      }.collect().sortBy(_._1)
    bounds.sliding(2).foreach {
      case Array((_, _, hiPrev), (_, loNext, _)) => assert(hiPrev <= loNext)
      case _ =>
    }
  }

  test("weightedSample matches the brute-force min-copy-hash draw exactly (T19)") {
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rows = (0L until 400L).map(i => (i, i % 7 + 1)) // weights 1..7
    val expected = rows
      .map { case (id, w) =>
        id -> (1L to w).map(j => md5hex(s"7:$id:$j")).min }
      .sortBy(_._2).take(50).map(_._1).toSet
    val got = Sampling.weightedSample(
        rows.toDF("doc_id", "wt").repartition(9), "doc_id", "wt", k = 50)
      .select("doc_id").as[Long].collect().toSet
    got shouldBe expected
    // partitioning-independent
    Sampling.weightedSample(rows.toDF("doc_id", "wt").repartition(2),
      "doc_id", "wt", k = 50).select("doc_id").as[Long].collect().toSet shouldBe expected
  }

  test("weightedSample prefers heavy rows and excludes non-positive weights (T19)") {
    // 300 heavy (w=10) + 300 light (w=1): a k=150 draw should skew heavily
    val rows = (0L until 300L).map(i => (i, 10L)) ++
      (300L until 600L).map(i => (i, 1L)) ++ Seq((9999L, 0L), (9998L, -3L))
    val got = Sampling.weightedSample(rows.toDF("doc_id", "wt"),
        "doc_id", "wt", k = 150)
      .select("doc_id").as[Long].collect().toSet
    got should not contain 9999L
    got should not contain 9998L
    val heavy = got.count(_ < 300L)
    val light = got.size - heavy
    assert(heavy > light * 3,
      s"heavy=$heavy light=$light — weighted draw not biased as expected")
    // a different seed draws a different set (same size)
    val other = Sampling.weightedSample(rows.toDF("doc_id", "wt"),
        "doc_id", "wt", k = 150, seed = 8L)
      .select("doc_id").as[Long].collect().toSet
    other.size shouldBe 150
    other should not equal got
  }
  test("importanceWeights separates target-like from raw-like docs (T25)") {
    // two disjoint vocabularies: target docs speak "alpha…", raw-only docs
    // speak "zulu…"; mixed docs carry both. The LLR must rank pure-target
    // lookalikes positive, pure-raw negative, and stay total over docs.
    val docs = ((0L until 20L).map(i => (i, "alpha beta gamma delta", true)) ++
      (20L until 80L).map(i => (i, "zulu yankee xray whiskey", false)) ++
      Seq((80L, "alpha beta zulu yankee", false),
        (81L, null.asInstanceOf[String], false)))
      .toDF("doc_id", "text", "is_en")
    val out = Sampling.importanceWeights(docs, "doc_id", "text",
      col("is_en"), buckets = 512).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    out.size shouldBe 82 // total, including the token-less null-text doc
    for (i <- 0L until 20L) { out(i)._1 should be > 0L; out(i)._2 shouldBe true }
    for (i <- 20L until 80L) { out(i)._1 should be < 0L; out(i)._2 shouldBe false }
    out(81L) shouldBe ((0L, false)) // zero tokens -> score 0, not selected
    // the mixed doc sits strictly between the pure classes
    out(80L)._1 should be < out(0L)._1
    out(80L)._1 should be > out(20L)._1
  }

  test("importanceWeights is partitioning-independent — integer arithmetic (T25)") {
    val docs = (0L until 300L)
      .map(i => (i, if (i % 3 == 0) "red green blue" else "cyan magenta yellow black",
        i % 3 == 0)).toDF("doc_id", "text", "tgt")
    val a = Sampling.importanceWeights(docs.repartition(17), "doc_id", "text",
      col("tgt"), buckets = 64).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Sampling.importanceWeights(docs.repartition(2), "doc_id", "text",
      col("tgt"), buckets = 64).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    a shouldBe b
  }

  test("importanceWeights rejects an empty target (T25)") {
    val docs = Seq((1L, "a b c", false)).toDF("doc_id", "text", "tgt")
    val e = intercept[IllegalArgumentException] {
      Sampling.importanceWeights(docs, "doc_id", "text", col("tgt"))
    }
    e.getMessage should include("target selector matches no tokens")
  }
}
