package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  test("applyChanges deletes, updates and inserts in one pass (R25)") {
    val snap = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "v")
    val changes = Seq(
      (2L, "b", 0.0, "D"),    // delete 2
      (3L, "c2", 33.0, "U"),  // update 3
      (4L, "d", 40.0, "I"))   // insert 4
      .toDF("id", "name", "v", "op")
    val out = Upsert.applyChanges(snap, changes, Seq("id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    out shouldBe Set((1L, "a", 10.0), (3L, "c2", 33.0), (4L, "d", 40.0))
  }

  test("applyChanges with an empty changeset is the identity (R25)") {
    val snap = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "name", "v")
    val empty = Seq.empty[(Long, String, Double, String)].toDF("id", "name", "v", "op")
    Upsert.applyChanges(snap, empty, Seq("id")).collect().length shouldBe 2
  }
}
