package graft

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.exec.{Materializer, RelationStore}

/** Focused materialization-strategy tests: on_schema_change variants and
  * insert_overwrite partition replacement (reference
  * tests/functional/incremental_schema_tests + materializations).
  */
class MaterializerSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark = GraftSession.local(4)
  lazy val store = new RelationStore(spark,
    java.nio.file.Files.createTempDirectory("mat_wh").toString)
  lazy val mat = new Materializer(spark, store)
  import org.apache.spark.sql.functions._

  def node(name: String, osc: String = "ignore", keys: Seq[String] = Seq("id"),
      parts: Seq[String] = Nil): ModelNode =
    ModelNode(name, "p", "", NodeConfig(
      materialized = Materialized.Incremental,
      incrementalStrategy = Some(if (parts.nonEmpty) "insert_overwrite" else "merge"),
      uniqueKey = keys, onSchemaChange = osc, partitionBy = parts), Nil, Nil, Nil)

  def df(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("id", "v")
  }

  test("on_schema_change=ignore keeps the target schema") {
    val n = node("t_ignore")
    mat.incremental(n, df(Seq((1L, "a"), (2L, "b"))), fullRefresh = false)
    import spark.implicits._
    val wider = Seq((2L, "b2", 99L), (3L, "c", 100L)).toDF("id", "v", "extra")
    mat.incremental(n, wider, fullRefresh = false)
    val out = store.read("t_ignore")
    assert(out.columns.toSeq == Seq("id", "v"))
    assert(out.count() == 3)
    assert(out.filter("id = 2 AND v = 'b2'").count() == 1) // merged update
  }

  test("on_schema_change=append_new_columns null-fills history") {
    val n = node("t_append", osc = "append_new_columns")
    mat.incremental(n, df(Seq((1L, "a"))), fullRefresh = false)
    import spark.implicits._
    val wider = Seq((2L, "b", 7L)).toDF("id", "v", "extra")
    mat.incremental(n, wider, fullRefresh = false)
    val out = store.read("t_append")
    assert(out.columns.toSeq == Seq("id", "v", "extra"))
    assert(out.filter("id = 1 AND extra IS NULL").count() == 1)
    assert(out.filter("id = 2 AND extra = 7").count() == 1)
  }

  test("on_schema_change=sync_all_columns adopts the new schema (add + drop)") {
    val n = node("t_sync", osc = "sync_all_columns")
    mat.incremental(n, df(Seq((1L, "a"))), fullRefresh = false)
    import spark.implicits._
    val changed = Seq((2L, 5L)).toDF("id", "w") // drops v, adds w
    mat.incremental(n, changed, fullRefresh = false)
    val out = store.read("t_sync")
    assert(out.columns.toSeq == Seq("id", "w"))
    assert(out.filter("id = 1 AND w IS NULL").count() == 1)
  }

  test("on_schema_change=fail raises on drift") {
    val n = node("t_fail", osc = "fail")
    mat.incremental(n, df(Seq((1L, "a"))), fullRefresh = false)
    import spark.implicits._
    val wider = Seq((2L, "b", 7L)).toDF("id", "v", "extra")
    assertThrows[IllegalStateException](mat.incremental(n, wider, fullRefresh = false))
  }

  test("insert_overwrite replaces only the incoming partitions") {
    import spark.implicits._
    val n = node("t_part", parts = Seq("day"))
    val day1 = Seq((1L, "a", "2024-01-01"), (2L, "b", "2024-01-02")).toDF("id", "v", "day")
    mat.incremental(n, day1, fullRefresh = false)
    // replace day 2 only; day 1 untouched
    val day2 = Seq((9L, "z", "2024-01-02")).toDF("id", "v", "day")
    mat.incremental(n, day2, fullRefresh = false)
    val out = store.read("t_part")
    assert(out.filter("day = '2024-01-01'").count() == 1)
    assert(out.filter("day = '2024-01-02'").count() == 1)
    assert(out.filter("day = '2024-01-02' AND id = 9").count() == 1)
  }
}
