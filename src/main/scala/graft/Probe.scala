package graft

/** Scratch main for inspecting schemas/plans during development. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    for (t <- graft.sources.Tables.all) {
      println(s"== $t ==")
      graft.sources.Tables.load(spark, dir, t).printSchema()
    }
    args.drop(1).headOption.foreach { q =>
      SparkEntry.queries(q)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
