package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.exec.{Context, RelationStore}
import graft.operators.ScaleOps

class ContextSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)

  test("run_query / store_result / load_result registry") {
    val ctx = new Context(spark,
      new RelationStore(spark, java.nio.file.Files.createTempDirectory("ctx_wh").toString),
      Map("answer" -> "42"))
    val rows = ctx.runQuery("SELECT 1 AS a UNION ALL SELECT 2")
    assert(rows.map(_.getInt(0)).sorted == Seq(1, 2))
    ctx.storeResult("probe", rows)
    assert(ctx.loadResult("probe").exists(_.size == 2))
    assert(ctx.loadResult("missing").isEmpty)
    assert(ctx.varOr("answer", "no") == "42")
    assert(ctx.varOr("nope", "fallback") == "fallback")
    assert(ctx.localMd5("abc") == "900150983cd24fb0d6963f7d28e17f72")
  }

  test("data-shaping context members: fromjson/tojson/fromyaml/toyaml/set/zip") {
    val ctx = new Context(spark,
      new RelationStore(spark, java.nio.file.Files.createTempDirectory("ctx_wh2").toString),
      Map.empty)
    val parsed = ctx.fromjson("""{"b": [1, 2], "a": "x"}""")
    assert(parsed == Map("b" -> List(1L, 2L), "a" -> "x"))
    // key order preserved through a round-trip (insertion-ordered maps)
    assert(ctx.tojson(parsed) == """{"b": [1, 2], "a": "x"}""")
    assert(ctx.fromyaml("dogs:\n - good\n - bad") ==
      Map("dogs" -> List("good", "bad")))
    assert(ctx.fromyaml(ctx.toyaml(parsed)) == Map("b" -> List(1, 2), "a" -> "x"))
    assert(ctx.setOf(Seq(1, 2, 2, 3)) == Seq(1, 2, 3))
    assert(ctx.zipOf(Seq(1, 2), Seq("a", "b")) == Seq(Seq(1, "a"), Seq(2, "b")))
  }

  test("diff_of_two_dicts matches the reference docstring; dbt_version present") {
    // base.py:691 docstring example: case-insensitive value compare,
    // dict_a casing preserved, empty remainders dropped
    val a = Map[String, Any]("key_x" -> List("value_1", "VALUE_2"), "key_y" -> List("value_3"))
    val b = Map[String, Any]("key_x" -> List("value_1"), "key_z" -> List("value_4"))
    val got = graft.parser.ContextFuncs.call("diff_of_two_dicts", List(a, b))
    assert(got == Map("key_x" -> List("VALUE_2"), "key_y" -> List("value_3")))
    val ctx = new graft.exec.Context(spark,
      new graft.exec.RelationStore(spark,
        java.nio.file.Files.createTempDirectory("ctx_wh2").toString),
      Map.empty)
    assert(ctx.dbtVersion == "1.9.0b2")
    assert(ctx.diffOfTwoDicts(a, b) == got)
  }

  test("salted two-phase aggregation is exact under any partitioning") {
    import org.apache.spark.sql.functions._
    val df = spark.range(0, 10000).toDF("id")
      .withColumn("k", (col("id") % 3).cast("string"))
      .withColumn("v", col("id") * 10)
      .repartition(13) // arbitrary partitioning; salt must not matter
    val salted = ScaleOps.saltedAgg(df, Seq("k"), col("v"), buckets = 7)
      .orderBy("k").collect()
    val direct = df.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .orderBy("k").collect()
    assert(salted.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      direct.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq)
  }
}
