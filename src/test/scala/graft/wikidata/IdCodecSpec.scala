package graft.wikidata

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IdCodecSpec extends SparkSpec {

  // Anchor values straight from the reference docs (README.md:72-83).
  test("encodes the documented examples") {
    IdCodec.qId(42) shouldBe 42L
    IdCodec.pId(31) shouldBe 1000000031L
    IdCodec.lId(234) shouldBe 2000000234L
    IdCodec.fId(99, 2) shouldBe 202000000099L
    IdCodec.sId(99, 1) shouldBe 112000000099L
  }

  test("encodeText parses all id shapes") {
    IdCodec.encodeText("Q42") shouldBe Some(42L)
    IdCodec.encodeText("P31") shouldBe Some(1000000031L)
    IdCodec.encodeText("L234") shouldBe Some(2000000234L)
    IdCodec.encodeText("L99-F2") shouldBe Some(202000000099L)
    IdCodec.encodeText("L99-S1") shouldBe Some(112000000099L)
    IdCodec.encodeText("X7") shouldBe None
    IdCodec.encodeText("Qabc") shouldBe None
    IdCodec.encodeText("") shouldBe None
  }

  test("decode inverts encode for all kinds (seeded sweep)") {
    val rng  = new scala.util.Random(42)
    val nums = Seq(0L, 1L, 42L, 999_999_999L) ++ Seq.fill(200)(rng.nextLong(1_000_000_000L))
    val subs = Seq(1L, 2L, 99L) ++ Seq.fill(20)(1 + rng.nextLong(99L))
    for (n <- nums) {
      IdCodec.decode(IdCodec.qId(n)) shouldBe (("Q", n, 0L))
      IdCodec.decode(IdCodec.pId(n)) shouldBe (("P", n, 0L))
      IdCodec.decode(IdCodec.lId(n)) shouldBe (("L", n, 0L))
    }
    for (n <- nums.take(40); m <- subs) {
      IdCodec.decode(IdCodec.fId(n, m)) shouldBe (("F", n, m))
      IdCodec.decode(IdCodec.sId(n, m)) shouldBe (("S", n, m))
    }
  }

  test("columnar encode agrees with scalar on 500 random ids incl. malformed") {
    import spark.implicits._
    val rng = new scala.util.Random(99)
    val ids = Seq.fill(500) {
      rng.nextInt(8) match {
        case 0 => s"Q${rng.nextInt(1000000000)}"
        case 1 => s"P${rng.nextInt(10000)}"
        case 2 => s"L${rng.nextInt(1000000)}"
        case 3 => s"L${rng.nextInt(1000000)}-F${1 + rng.nextInt(50)}"
        case 4 => s"L${rng.nextInt(1000000)}-S${1 + rng.nextInt(50)}"
        case 5 => s"q${rng.nextInt(100)}"
        case 6 => "bogus" + rng.nextInt(10)
        case _ => s"Q${rng.nextInt(100)}x" // trailing garbage
      }
    }
    val columnar = ids.toDF("t")
      .select(IdCodec.encodeTextCol(col("t")).as("enc")).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    val scalar = ids.map(IdCodec.encodeText)
    // scalar rejects trailing garbage (toLong throws); columnar substring
    // cast is equally strict (cast returns null on non-numeric)
    columnar.toSeq shouldBe scalar
  }

  test("native encode agrees with the SQL when-chain formulation on edge shapes") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val edge = Seq(
      "", "Q", "P", "L", "-", "Q-", "L-", "L-F2", "L1-", "L1-F", "L1-X2",
      "Q-42", "Q+42", "P+7", "Q 42", "q 9 ", "L1-F2-S3", "L1--F2", "--",
      "Q" + "9" * 18, "Q" + "9" * 19, "L" + "8" * 18 + "-F2",
      "Qbroken", "QQ1", "L1-f2", "l1-s2", "P31x", " Q42",
      // cast-semantics edges: decimal-tail truncation and control-char trim
      "Q1.5", "Q\t42", "Q42\n", "P7.9", "L2.5-F1", "Q.", "Q-1.5")
    val fuzz = Seq.fill(400)(Seq.fill(1 + rng.nextInt(10))(
      "QPLFSqplfs-+ 0123456789x".charAt(rng.nextInt(24))).mkString)
    val ids = edge ++ fuzz
    val rows = ids.toDF("t")
      .select(IdCodec.encodeTextCol(col("t")).as("native"),
        IdCodec.encodeTextColSql(col("t")).as("sql"))
      .collect()
    for ((r, id) <- rows.zip(ids)) {
      withClue(s"id='$id': ") {
        (if (r.isNullAt(0)) None else Some(r.getLong(0))) shouldBe
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))
      }
    }
  }

  test("columnar encode/decode agrees with scalar") {
    import spark.implicits._
    val ids = Seq("Q42", "P31", "L234", "L99-F2", "L99-S1", "q7", "l3-f1", "junk")
    val out = ids.toDF("t")
      .select(col("t"), IdCodec.encodeTextCol(col("t")).as("enc"))
      .withColumn("kind", IdCodec.kindCol(col("enc")))
      .withColumn("num", IdCodec.numCol(col("enc")))
      .withColumn("sub", IdCodec.subCol(col("enc")))
      .collect()
      .map(r => r.getString(0) -> Option(r.get(1)).map(_ => (r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4))))
      .toMap
    out("Q42") shouldBe Some((42L, "Q", 42L, 0L))
    out("P31") shouldBe Some((1000000031L, "P", 31L, 0L))
    out("L234") shouldBe Some((2000000234L, "L", 234L, 0L))
    out("L99-F2") shouldBe Some((202000000099L, "F", 99L, 2L))
    out("L99-S1") shouldBe Some((112000000099L, "S", 99L, 1L))
    out("q7") shouldBe Some((7L, "Q", 7L, 0L))
    out("l3-f1") shouldBe Some((102000000003L, "F", 3L, 1L))
    out("junk") shouldBe None
  }
}
