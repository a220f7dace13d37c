package graft.tools

import org.apache.spark.sql.functions._

/** Stage-by-stage micro-profiler for the heaviest pipelines (dev tool;
  * run with `sbt "runMain graft.tools.Profile [sfDir]"`). Times each
  * stage of the MinHash-LSH dedup in isolation so regressions point at
  * a stage, not a query.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(32)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    val raw = docs
      .select(col("doc_id"), split(graft.operators.TextOps.normalized(col("text")), " ").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"),
        explode(expr("transform(sequence(0, size(w)-3), i -> concat_ws(' ', w[i], w[i+1], w[i+2]))")).as("s"))
    time("raw shingles (count)")(raw.count())
    time("raw shingles again")(raw.count())
    time("xxhash64 scan")(raw.select(xxhash64(col("s")).as("h")).agg(sum(expr("h % 1048576"))).collect())
    time("md5hash64 scan")(
      raw.select(graft.operators.DedupOps.md5Hash64(col("s")).as("h")).agg(sum(expr("h % 1048576"))).collect())
    val sh = raw.select(col("doc_id"), graft.operators.DedupOps.md5Hash64(col("s")).as("h")).cache()
    time("cache fill")(sh.count())
    val sigs = sh.groupBy(col("doc_id"))
      .agg(graft.functions.MinHashAgg.minhashSig(col("h"), 32).as("sig"))
    time("signatures")(sigs.agg(sum(expr("sig[0] % 1048576"))).collect())
    val bandCols = (0 until 8).map { b =>
      val slots = (0 until 4).map(r => s"sig[${b * 4 + r}]").mkString(", ")
      expr(s"concat_ws(',', $b, $slots)").as(s"band$b")
    }
    val banded = sigs.select(col("doc_id") +: bandCols: _*)
      .select(col("doc_id"), explode(array((0 until 8).map(b => col(s"band$b")): _*)).as("bk"))
    time("banded")(banded.count())
    val cand = banded.alias("x").join(banded.alias("y"), col("x.bk") === col("y.bk"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct().cache()
    time("candidates")(cand.count())
    time("full dedupMinHashLsh")(graft.operators.DedupOps.dedupMinHashLsh(spark, dir).count())
    time("full again")(graft.operators.DedupOps.dedupMinHashLsh(spark, dir).count())
    time("full again 2")(graft.operators.DedupOps.dedupMinHashLsh(spark, dir).count())
    spark.stop()
  }
}
