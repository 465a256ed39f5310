package graft.wikidata

import graft.SparkSpec
import java.sql.DriverManager

/** W13: JDBC sink parity against embedded Derby — the same shape as the
  * reference's SQLite database (tables + every-column indices), readable
  * back through Spark's JDBC source.
  */
class JdbcSinkSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:wdtest;create=true"

  test("writes all 8 tables + indices to a JDBC database and reads back (W13)") {
    val tables = WikidataEtl.run(DumpReader.fromLines(spark, Seq(
      """{"id":"Q1","type":"item","labels":{"en":{"language":"en","value":"one"}},"descriptions":{},"claims":{
         "P31":[{"mainsnak":{"snaktype":"value","property":"P31","datavalue":{"value":{"entity-type":"item","numeric-id":5,"id":"Q5"},"type":"wikibase-entityid"}},"type":"statement","rank":"normal"}],
         "P18":[{"mainsnak":{"snaktype":"value","property":"P18","datavalue":{"value":"One.jpg","type":"string"}},"type":"statement","rank":"normal"}]
        }}""".replaceAll("\n\\s*", ""),
      """{"id":"Q2","type":"item","labels":{"en":{"language":"en","value":"two"}},"descriptions":{"en":{"language":"en","value":"the second"}},"claims":{}}""")))

    JdbcSink.writeTables(tables, url)

    // read back through the Spark JDBC source
    val meta = spark.read.jdbc(url, "\"meta\"", new java.util.Properties())
    meta.count() shouldBe 2
    meta.filter("label = 'two'").select("description").collect().head.getString(0) shouldBe "the second"
    spark.read.jdbc(url, "\"entity\"", new java.util.Properties()).count() shouldBe 1
    spark.read.jdbc(url, "\"string\"", new java.util.Properties()).count() shouldBe 1

    // reference-style indices exist (Derby reports them in SYS.SYSCONGLOMERATES)
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(
        "SELECT COUNT(*) FROM SYS.SYSCONGLOMERATES WHERE ISINDEX")
      rs.next()
      assert(rs.getInt(1) >= 10, "expected per-column indices to be created")
    } finally conn.close()
  }
}
