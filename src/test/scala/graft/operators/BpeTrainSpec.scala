package graft.operators

import graft.SparkSpec

/** T29: in-engine BPE training — the incremental greedy loop against a
  * naive full-rescan reference, prefix stability, exhaustion, and the
  * cross-implementation anchor: trained over the shipped merge table's own
  * sources, the Scala trainer must reproduce the python-trained
  * src/main/resources/graft/bpe_merges.txt prefix exactly. */
class BpeTrainSpec extends SparkSpec {

  /** Naive reference: full pair recount + argmax + merge pass per step —
    * the O(steps × vocab) law the incremental trainer must equal. */
  private def naive(vocab: Seq[(String, Long)], n: Int): Seq[(String, String)] = {
    var words = vocab.map { case (w, c) => (w.map(_.toString).toVector, c) }
    val out = scala.collection.mutable.Buffer.empty[(String, String)]
    var done = false
    while (out.size < n && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((toks, c) <- words; p <- toks.zip(toks.tail))
        counts(p) = counts.getOrElse(p, 0L) + c
      if (counts.isEmpty) done = true
      else {
        val ((a, b), _) = counts.maxBy { case ((x, y), c) => (c, x, y) }
        out += ((a, b))
        words = words.map { case (toks, c) =>
          val nb = Vector.newBuilder[String]
          var i = 0
          while (i < toks.length) {
            if (i < toks.length - 1 && toks(i) == a && toks(i + 1) == b) {
              nb += a + b; i += 2
            } else { nb += toks(i); i += 1 }
          }
          (nb.result(), c)
        }
      }
    }
    out.toSeq
  }

  private def randomVocab(seed: Long, nWords: Int): Seq[(String, Long)] = {
    val rnd = new scala.util.Random(seed)
    val alpha = "abcd"
    (0 until nWords).map { _ =>
      val w = (0 until (1 + rnd.nextInt(8)))
        .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      w -> (1L + rnd.nextInt(5))
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
  }

  test("incremental trainer ≡ naive full-rescan reference on random vocabularies") {
    for (seed <- 1L to 6L) {
      val vocab = randomVocab(seed, 60)
      withClue(s"seed $seed: ") {
        BpeTrain.trainFromCounts(vocab, 25) shouldBe naive(vocab, 25)
      }
    }
  }

  test("greedy merges are prefix-stable: train(n) is a prefix of train(m>n)") {
    val vocab = randomVocab(42L, 80)
    val long = BpeTrain.trainFromCounts(vocab, 40)
    BpeTrain.trainFromCounts(vocab, 15) shouldBe long.take(15)
  }

  test("a fully-merged vocabulary exhausts: fewer merges than asked, no loop") {
    val vocab = Seq("ab" -> 3L, "ab" -> 2L).groupBy(_._1)
      .view.mapValues(_.map(_._2).sum).toSeq
    val merges = BpeTrain.trainFromCounts(Seq("ab" -> 5L, "cd" -> 1L), 100)
    merges.size shouldBe 2 // (a,b) then (c,d); nothing left to merge
    merges.head shouldBe ("a", "b")
    vocab.size shouldBe 1 // (guard the fixture itself)
  }

  test("distributed counting + trainer reproduce the python-trained shipped table prefix") {
    // the shipped table's own recipe (tools/train_bpe.py defaults): the
    // union of every text-bearing column at sf0.1, count-weighted
    val sf = "/root/testdata/sf0.1"
    assume(new java.io.File(sf).isDirectory)
    val t = graft.Tables(spark, sf)
    val counts = Seq(
      BpeTrain.wordCounts(t.documents, Seq("text")),
      BpeTrain.wordCounts(t.part, Seq("p_name", "p_type")),
      BpeTrain.wordCounts(t.customer, Seq("c_name")),
      BpeTrain.wordCounts(t.supplier, Seq("s_name")),
      BpeTrain.wordCounts(t.events, Seq("props")))
      .flatten.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
    val trained = BpeTrain.trainFromCounts(counts, 64)
    trained shouldBe graft.functions.Bpe.merges.take(64)
  }
}
