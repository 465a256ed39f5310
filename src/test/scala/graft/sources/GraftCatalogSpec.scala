package graft.sources

import java.time.format.DateTimeFormatter

import graft.SparkSpec
import graft.operators.SnapshotTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.functions._

/** R58: the snapshot warehouse as a Spark TableCatalog (pure-SQL access). */
class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  /** Commit v1 (ids 1-20), boundary, v2 append (ids 21-60, tag "cut-1"). */
  private def setup(scratchName: String): (String, String, Long) = {
    val t = graft.Scratch.fresh(scratchName)
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.warehouse",
      new java.io.File(t).getParent)
    val rows = (1 to 60).map(i => (i.toLong, i * 2))
    SnapshotTable.commit(spark, t, rows.filter(_._1 <= 20).toDF("id", "v"))
    Thread.sleep(5); val t1 = System.currentTimeMillis(); Thread.sleep(5)
    SnapshotTable.commit(spark, t, rows.filter(_._1 > 20).toDF("id", "v"),
      mode = SnapshotTable.Append, tag = Some("cut-1"))
    (t, new java.io.File(t).getName, t1)
  }

  private def ids(df: DataFrame): Set[Long] = df.select("id").as[Long].collect().toSet

  test("SQL reads: latest, VERSION AS OF n, VERSION AS OF 'tag' (R58)") {
    val (_, name, _) = setup("cat_sql")
    ids(spark.sql(s"SELECT * FROM graft_cat.`$name`")) shouldBe (1L to 60L).toSet
    ids(spark.sql(s"SELECT * FROM graft_cat.`$name` VERSION AS OF 1")) shouldBe
      (1L to 20L).toSet
    // the R44 commit tag resolves through the same clause
    ids(spark.sql(s"SELECT * FROM graft_cat.`$name` VERSION AS OF 'cut-1'")) shouldBe
      (1L to 60L).toSet
    intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_cat.`$name` VERSION AS OF 'no-such-tag'").collect()
    }.getMessage should include("no version or tag")
  }

  test("TIMESTAMP AS OF resolves the boundary via SQL and the catalog API (R58)") {
    val (t, name, t1) = setup("cat_ts")
    // SQL leg: format the boundary in the session time zone
    val zone = java.time.ZoneId.of(spark.conf.get("spark.sql.session.timeZone"))
    val lit = java.time.Instant.ofEpochMilli(t1).atZone(zone).toLocalDateTime
      .format(DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
    ids(spark.sql(s"SELECT * FROM graft_cat.`$name` TIMESTAMP AS OF '$lit'")) shouldBe
      (1L to 20L).toSet
    // API leg: Spark hands catalogs epoch micros
    val cat = new GraftCatalog
    cat.initialize("graft_cat", new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("warehouse", new java.io.File(t).getParent)))
    val table = cat.loadTable(Identifier.of(Array.empty[String], name), t1 * 1000L)
    table.name() should include(name)
  }

  test("SHOW TABLES lists manifest dirs; missing tables and namespaces fail (R58)") {
    val (_, name, _) = setup("cat_list")
    val listed = spark.sql("SHOW TABLES IN graft_cat").select("tableName")
      .as[String].collect().toSet
    listed should contain(name)
    intercept[Exception] {
      spark.sql("SELECT * FROM graft_cat.`no_such_table_xyz`").collect()
    }
    intercept[Exception] {
      spark.sql("SHOW TABLES IN graft_cat.no_such_ns").collect()
    }
  }

  test("the catalog is read-only: DDL and DML are rejected (R58)") {
    val (_, name, _) = setup("cat_ro")
    intercept[Exception] {
      spark.sql(s"DROP TABLE graft_cat.`$name`")
    }.getMessage should include("read-only")
    intercept[Exception] {
      spark.sql(s"CREATE TABLE graft_cat.`new_t` (id BIGINT) USING parquet")
    }
    intercept[Exception] { // no SupportsWrite capability on the table
      spark.sql(s"INSERT INTO graft_cat.`$name` VALUES (999, 0)")
    }
  }

  test("catalog reads share the R57 scan shape: pushdown and pruning (R58)") {
    val (_, name, _) = setup("cat_plan")
    val df = spark.sql(
      s"SELECT id FROM graft_cat.`$name` WHERE v > 100")
    val plan = df.queryExecution.executedPlan.toString
    plan should include("PushedFilters: [IsNotNull(v), GreaterThan(v,100)]")
    plan should include("ReadSchema: struct<id:bigint,v:int>")
    ids(df) shouldBe (51L to 60L).toSet
  }
}
