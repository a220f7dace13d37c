package graft

import java.nio.file.{Files, Paths}

/** Dev tool: dump the formatted physical plan of named queries
  * (comma-separated arg; default: all) to /tmp/graft_explain/<name>.txt.
  * The per-operator scale audit loop — `.explain("formatted")` until
  * the plan is the one you'd want at 100 TB, per SURVEY.md §4.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val outDir = Paths.get(sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_DIR", "/tmp/graft_explain"))
    Files.createDirectories(outDir)
    val spark = GraftSession.local(8)
    val names = args.headOption.map(_.split(',').toSeq)
      .getOrElse(SparkEntry.queries.keys.toSeq.sorted)
    // SPARK_GRAFT_EXPLAIN_EXEC=1: execute first so AQE finalizes —
    // runtime exchange/stage reuse only shows in the final plan
    val exec = sys.env.get("SPARK_GRAFT_EXPLAIN_EXEC").contains("1")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      if (exec) df.collect()
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(outDir.resolve(s"$n.txt"), plan)
    }
    spark.stop()
  }
}
