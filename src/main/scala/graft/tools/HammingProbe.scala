package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.{DedupOps, Multimodal}

/** Scaling probe for the exact-hamming multi-index family (dev tool;
  * `sbt "runMain graft.tools.HammingProbe [sfList]"`, default
  * `4,10,20,40` → 200 k / 500 k / 1 M / 2 M ScaleGen documents).
  *
  * For each corpus size it computes the REAL mm signature table
  * ([[Multimodal.mmPhashOf]] over [[ScaleGen.documents]]) and, for the
  * chunk-PAIR and chunk-TRIPLE index arms at d = 8:
  *
  *  - `candVol` — Σ_buckets n², the exact pre-filter candidate volume
  *    the self-join would produce (computed from bucket counts, so the
  *    pair arm's quadratic regime is measurable even where actually
  *    RUNNING its join would be minutes);
  *  - `maxBkt` — the largest (ci, chunk) bucket;
  *  - wall time and result count of the full [[DedupOps.hammingPairs]]
  *    with the arm FORCED via `spark.graft.hamming.tripleMinRows`
  *    (MaxValue → pair, 0 → triple). Equal counts across arms is the
  *    recall-1 pigeonhole guarantee checked at scale, not just on the
  *    planted OpsSpec fixture.
  *
  * The published table lives in BENCH_SCALE.md ("chunk-pair vs
  * chunk-triple" section); this main regenerates it bit-identically
  * (counter-mode ScaleGen corpus, deterministic signatures).
  */
object HammingProbe {
  private val D = 8 // the registered mm_phash_pairs radius

  private def bucketStats(chunked: DataFrame): (Long, Long, Long) = {
    val r = chunked.groupBy(col("ci"), col("chunk")).count()
      .agg(sum(col("count") * col("count")).as("vol"),
        max(col("count")).as("mx"), count(lit(1)).as("nb"))
      .collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  def main(args: Array[String]): Unit = {
    val sfs = args.headOption.getOrElse("4,10,20,40").split(',').map(_.toDouble)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    println(f"${"docs"}%9s ${"arm"}%7s ${"buckets"}%12s ${"maxBkt"}%9s " +
      f"${"candVol"}%14s ${"pairs"}%9s ${"wall_s"}%7s")
    for (sf <- sfs) {
      val n = ScaleGen.nDocuments(sf)
      val sigs = Multimodal.mmPhashOf(ScaleGen.documents(spark, sf))
        .select(col("doc_id"), col("phash")).cache()
      sigs.count()
      // the index join runs over DISTINCT signatures since the r15
      // collapse-exact-first rewrite — bucket stats on the distinct
      // set are the volumes the candidate join actually processes
      val uniq = sigs.select(col("phash")).distinct()
        .select(col("phash").as("doc_id"), col("phash")).cache()
      val nUniq = uniq.count()
      println(f"$n%9d docs, $nUniq%9d distinct signatures")
      // joins whose pre-filter candidate volume exceeds the budget are
      // reported stats-only (pairs/wall "—"): on this corpus the TRUE
      // pair count itself grows ∝ N² (planted dup clusters scale with
      // the corpus), so the join's OUTPUT — identical for both arms —
      // dominates past ~500 k docs and adds no index-comparison signal;
      // candVol/maxBkt are the per-arm quantities under test
      val joinBudget = sys.env.getOrElse(
        "SPARK_GRAFT_PROBE_MAX_JOIN_CANDVOL", "300000000000").toLong
      for ((arm, chunked, minRows) <- Seq(
          ("pair", DedupOps.chunkPairSigs(uniq, "phash", D), Long.MaxValue),
          ("triple", DedupOps.chunkTripleSigs(uniq, "phash", D), 0L))) {
        val (vol, mx, nb) = bucketStats(chunked)
        if (vol <= joinBudget) {
          spark.conf.set("spark.graft.hamming.tripleMinRows", minRows.toString)
          val t0 = System.nanoTime()
          val pairs = DedupOps.hammingPairs(sigs, "phash", D, Some(n)).count()
          val wall = (System.nanoTime() - t0) / 1e9
          println(f"$n%9d $arm%7s $nb%12d $mx%9d $vol%14d $pairs%9d $wall%7.1f")
        } else
          println(f"$n%9d $arm%7s $nb%12d $mx%9d $vol%14d ${"—"}%9s ${"—"}%7s")
      }
      sigs.unpersist()
      uniq.unpersist()
      spark.conf.set("spark.graft.hamming.tripleMinRows", "1000000")
    }
    spark.stop()
  }
}
