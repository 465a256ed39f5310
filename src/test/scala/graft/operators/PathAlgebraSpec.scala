package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** W21 composed property paths: parser, algebra semantics vs brute-force
  * reachability, and the zero-hop sequence rewrite. */
class PathAlgebraSpec extends SparkSpec {
  import spark.implicits._
  import PathAlgebra._

  // two random edge sets over a shared node space 1..60
  private lazy val (e31, e279): (Seq[(Long, Long)], Seq[(Long, Long)]) = {
    val rng = new scala.util.Random(7)
    val inst = (100L to 140L).map(i => (i, 1L + rng.nextInt(60)))
    // acyclic ontology: node i -> smaller node
    val ont = (2 to 60).flatMap { i =>
      Seq.fill(1 + rng.nextInt(2))((i.toLong, (1 + rng.nextInt(i - 1)).toLong)).distinct
    }
    (inst, ont)
  }

  private def edgesOf(pid: Long): DataFrame = pid match {
    case 31L => e31.toDF("src", "dst")
    case 279L => e279.toDF("src", "dst")
    case other => sys.error(s"no edges for P$other")
  }

  private def run(expr: String): Set[(Long, Long)] =
    PathAlgebra.eval(expr, edgesOf).as[(Long, Long)].collect().toSet

  // brute-force composition helpers over in-memory pair sets
  private def comp(a: Set[(Long, Long)], b: Set[(Long, Long)]): Set[(Long, Long)] = {
    val byStart = b.groupBy(_._1)
    a.flatMap { case (s, m) => byStart.getOrElse(m, Set.empty).map(e => (s, e._2)) }
  }
  private def closure(e: Set[(Long, Long)]): Set[(Long, Long)] = {
    var r = e
    var grown = true
    while (grown) {
      val next = r ++ comp(r, e)
      grown = next.size != r.size
      r = next
    }
    r
  }

  test("parser round-trips the SPARQL grammar (W21)") {
    parse("P31") shouldBe Prop(31)
    parse("^P279") shouldBe Inverse(Prop(279))
    parse("P31/P279*") shouldBe Sequence(Prop(31), Star(Prop(279)))
    parse("(P31|P101)/P279+") shouldBe
      Sequence(Alternative(Prop(31), Prop(101)), Plus(Prop(279)))
    parse("P31/(^P279)?") shouldBe Sequence(Prop(31), Optional(Inverse(Prop(279))))
    // precedence: '/' binds tighter than '|'
    parse("P1/P2|P3") shouldBe Alternative(Sequence(Prop(1), Prop(2)), Prop(3))
    intercept[IllegalArgumentException](parse("P31/"))
    intercept[IllegalArgumentException](parse("(P31"))
    intercept[IllegalArgumentException](parse("Q31"))
  }

  test("compose(P31, closure(P279)) equals brute-force reachability (W21)") {
    val a = e31.toSet
    val b = e279.toSet
    run("P31/P279+") shouldBe comp(a, closure(b))
    // the zero-hop rewrite: a/b* = a/b+ ∪ a — keeps instances of classes
    // with no outgoing ontology edge
    run("P31/P279*") shouldBe (comp(a, closure(b)) ++ a)
  }

  test("alternation, inverse, and optional match their set semantics (W21)") {
    val a = e31.toSet
    val b = e279.toSet
    run("P31|P279") shouldBe (a ++ b)
    run("^P31") shouldBe a.map(_.swap)
    // b?/a = b/a ∪ a (zero-or-one rewrite on the left)
    run("P279?/P31") shouldBe (comp(b, a) ++ a)
    // top-level star: closure plus identity over the sub-path's nodes
    val nodes = b.flatMap(p => Seq(p._1, p._2))
    run("P279*") shouldBe (closure(b) ++ nodes.map(n => (n, n)))
  }

  test("path('P279*') matches QueryApi.pathClosure on the wikidata surface (W21 ≡ W20)") {
    // minimal claims entity table: (id, property_id, entity_id)
    // the REAL surface stores ENCODED property ids — path("P279*") must
    // reach them (the raw-pid fixture previously masked a real bug here)
    val entity = e279.map { case (s, d) => (s, graft.wikidata.IdCodec.pId(279), d) }
      .toDF("id", "property_id", "entity_id")
    val tables = graft.wikidata.WikidataTables(
      meta = spark.emptyDataFrame, string = spark.emptyDataFrame,
      entity = entity, coordinates = spark.emptyDataFrame,
      quantity = spark.emptyDataFrame, time = spark.emptyDataFrame,
      none = spark.emptyDataFrame, unknown = spark.emptyDataFrame)
    val api = graft.wikidata.QueryApi(tables)
    val viaAlgebra = api.path("P279*").as[(Long, Long)].collect().toSet
    val viaClosure = api.pathClosure(graft.wikidata.IdCodec.pId(279)).as[(Long, Long)].collect().toSet
    viaAlgebra shouldBe viaClosure
  }

  // ------------------------------------------------------------- W30

  private def allEdges(): DataFrame =
    (e31.map { case (s, d) => (31L, s, d) } ++
      e279.map { case (s, d) => (279L, s, d) })
      .toDF("pid", "src", "dst")

  private def runNeg(expr: String): Set[(Long, Long)] =
    PathAlgebra.eval(expr, edgesOf, allEdges _).as[(Long, Long)].collect().toSet

  test("negated property sets: per-direction legs match SPARQL semantics (W30)") {
    val fwd31 = e31.toSet
    val fwd279 = e279.toSet
    val rev = (s: Set[(Long, Long)]) => s.map { case (a, b) => (b, a) }
    runNeg("!P31") shouldBe fwd279 // forward leg only, P31 excluded
    runNeg("!(P31|P279)") shouldBe Set.empty // everything excluded
    runNeg("!(^P31)") shouldBe rev(fwd279) // inverse leg only
    // mixed: forward-not-31 ∪ reversed-not-279
    runNeg("!(P31|^P279)") shouldBe (fwd279 ++ rev(fwd31))
    // a property never negated passes both legs
    runNeg("!(P999)") shouldBe (fwd31 ++ fwd279)
  }

  test("negated sets compose with sequence and closure (W30)") {
    // !P31 ≡ P279 here, so !P31+ must equal the P279 closure
    runNeg("!P31+") shouldBe closure(e279.toSet)
    runNeg("P31/!P31") shouldBe comp(e31.toSet, e279.toSet)
    // parser shapes
    parse("!P31") shouldBe NegatedSet(Seq(31L), Nil)
    parse("!(P31|^P279|P5)*") shouldBe Star(NegatedSet(Seq(31L, 5L), Seq(279L)))
    intercept[IllegalArgumentException](parse("!(P31|"))
    // evaluating a negated set without allEdges fails loudly
    intercept[IllegalArgumentException](
      PathAlgebra.eval("!P31", edgesOf).collect())
  }
}
