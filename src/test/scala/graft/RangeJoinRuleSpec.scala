package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.RangeJoinRewrite

/** The automatic range-join bucketing rule (plans/RangeJoinRewrite,
  * injected via spark.sql.extensions): a pure-inequality interval join
  * must stop planning as BroadcastNestedLoopJoin once a bin size is
  * configured, and the rewritten plan must return EXACTLY the naive
  * plan's rows — the rewrite is sound for any bin by floor
  * monotonicity, so equality is tested at several bins.
  */
class RangeJoinRuleSpec extends AnyFunSuite with BeforeAndAfterAll {
  val sf = "/root/testdata/sf0.001"
  var spark: SparkSession = _
  override def beforeAll(): Unit = { spark = GraftSession.local(4) }
  override def afterAll(): Unit = spark.conf.unset(RangeJoinRewrite.BinConf)

  /** views × clicks interval join, deliberately with NO equi conjunct. */
  private def intervalJoin(): DataFrame = {
    val e = graft.sources.Tables.load(spark, sf, "events")
    val views = e.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("ts_us").as("view_us"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("ts_us").as("click_us"))
    clicks.join(views,
      col("view_us") <= col("click_us") &&
        col("click_us") - col("view_us") <= 600000000L) // 10 min
  }

  private def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString

  test("disabled by default: inequality join stays a nested-loop join") {
    spark.conf.unset(RangeJoinRewrite.BinConf)
    assert(plan(intervalJoin()).contains("BroadcastNestedLoopJoin"))
  }

  test("with a bin size the join becomes a bucketed equi join, same rows") {
    spark.conf.unset(RangeJoinRewrite.BinConf)
    val naive = intervalJoin().collect().map(_.toSeq).sortBy(_.toString)
    assert(naive.nonEmpty, "fixture join must produce rows")
    for (bin <- Seq(600000000L, 3600000000L, 77777777L)) {
      spark.conf.set(RangeJoinRewrite.BinConf, bin.toString)
      val df = intervalJoin()
      val p = plan(df)
      assert(!p.contains("BroadcastNestedLoopJoin"), s"bin $bin: still nested-loop\n${p.take(1500)}")
      assert(p.contains("__rjb") && p.toLowerCase.contains("generate"),
        s"bin $bin: bucketing missing\n${p.take(1500)}")
      val got = df.collect().map(_.toSeq).sortBy(_.toString)
      assert(got.length == naive.length, s"bin $bin: ${got.length} vs ${naive.length} rows")
      assert(got.zip(naive).forall { case (a, b) => a == b }, s"bin $bin: row mismatch")
    }
  }

  test("joins with an equi conjunct are left alone") {
    spark.conf.set(RangeJoinRewrite.BinConf, "3600000000")
    // manual bucketing (qRangeJoin) already has equi keys — the rule
    // must not re-bucket it (its own __rjb guard + equi guard)
    val df = graft.operators.Events.qRangeJoin(spark, sf)
    val p = plan(df)
    assert(!p.contains("__rjb"), p.take(1500))
    assert(df.count() > 0)
  }

  test("qRangeJoinAuto fires the rewrite without arming the caller's session") {
    spark.conf.unset(RangeJoinRewrite.BinConf)
    val df = graft.operators.Events.qRangeJoinAuto(spark, sf)
    // the rewrite fired inside the query's scoped child session...
    val p = plan(df)
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1500))
    assert(p.contains("__rjb"), p.take(1500))
    assert(df.count() == 1)
    // ...and the caller's conf is untouched: a fresh inequality join in
    // THIS session still plans as a nested loop (rule disarmed here)
    assert(spark.conf.getOption(RangeJoinRewrite.BinConf).isEmpty,
      "qRangeJoinAuto leaked its bin-size conf into the caller's session")
    assert(plan(intervalJoin()).contains("BroadcastNestedLoopJoin"))
  }

  test("inverted and null intervals produce no rows and no errors") {
    val ss = spark
    import ss.implicits._
    spark.conf.set(RangeJoinRewrite.BinConf, "10")
    val probe = Seq(5L, 50L, 500L).toDF("p")
    val iv = Seq((100L, 1L), (40L, 60L)).toDF("lo", "hi") // first is inverted
    val out = probe.join(iv, col("p") >= col("lo") && col("p") <= col("hi")).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(50L))
  }
}
