import org.apache.spark.sql.functions._

object ProbeKcore {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    val dir = "/root/testdata/sf0.1"
    def med(label: String)(f: => Long): Unit = {
      val ts = (1 to 3).map { _ => val t0 = System.nanoTime(); f; (System.nanoTime()-t0)/1e9 }.sorted
      println(f"$label%-38s median ${ts(1)}%6.2f s (${ts.head}%4.2f..${ts(2)}%4.2f)")
    }
    val qs = Seq("graph_linkpred", "q21_sole_late_supplier", "q2_min_balance_supplier",
      "dedup_minhash_lsh", "sim_knn_graph", "dedup_ppjoin", "dedup_recall_eval",
      "q_equidepth_bins", "q3_shipping_priority", "q9_product_profit")
    def sweep(tag: String): Unit =
      qs.foreach(n => med(s"$tag $n")(graft.SparkEntry.queries(n)(spark, dir).count()))
    sweep("smj      ")
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
    sweep("shj-pref ")
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")
    spark.conf.set("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64MB")
    sweep("aqe-shj  ")
    spark.stop()
  }
}
