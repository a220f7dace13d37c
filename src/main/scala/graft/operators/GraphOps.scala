package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed graph operators for corpus curation. The one that
  * matters at 100 TB is connected components: near-dup PAIRS (from
  * MinHash/SimHash banding) are only half of dedup — "keep one copy
  * per duplicate CLUSTER" needs the transitive closure of the pair
  * relation, and clusters routinely chain (A~B, B~C, A≁C).
  */
object GraphOps {

  /** Connected components by hash-to-min label propagation.
    *
    * `edges` has two long columns `src`, `dst` (undirected; one row per
    * pair is enough). Returns (node, lab) where lab = the minimum node
    * id in the component — a deterministic, collision-free cluster id.
    *
    * Scale design:
    *  - each round is one shuffle (join edges⋈labels on src, then a
    *    min-aggregate on dst) — the standard hash-to-min step. Rounds
    *    needed = graph diameter; near-dup clusters are shallow (a few
    *    hops), so the loop converges in 2-4 rounds in practice. For
    *    adversarially long chains the large-star/small-star variant
    *    halves diameter per round; same join/agg building blocks.
    *  - `localCheckpoint` after every round truncates lineage —
    *    without it each iteration's plan embeds all previous ones and
    *    Catalyst re-optimizes an exponentially growing tree.
    *  - convergence test is `isEmpty` on the changed-label diff: a
    *    driver boolean per round, never a collect of labels.
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    // materialize the edge list ONCE: without this every round's join
    // re-executes the upstream pair-generation pipeline (for
    // dedupClusters, the full SimHash banding) inside its own job
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    val nodes = sym.select(col("src").as("node")).distinct()
    var labels = nodes.withColumn("lab", col("node")).localCheckpoint()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val next = sym
        .join(labels.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"), col("lab"))
        .union(labels)
        .groupBy(col("node")).agg(min(col("lab")).as("lab"))
        .localCheckpoint()
      converged = next.alias("n")
        .join(labels.alias("o"), Seq("node"))
        .filter(col("n.lab") < col("o.lab"))
        .isEmpty
      labels = next
      iter += 1
    }
    labels
  }

  /** Duplicate clusters over the SimHash near-dup pair graph
    * (hamming ≤ 3 — exact duplicates hash identically, so they are a
    * subset of these edges). One row per clustered document:
    * cluster_id = min doc_id in the cluster, keep = 1 on that minimum
    * (the canonical survivor), cluster_size for audit. Documents with
    * no near-duplicate are not emitted — at scale you left-join this
    * table back to the corpus and treat null as "keep".
    */
  def dedupClusters(s: SparkSession, dir: String): DataFrame = {
    val pairs = DedupOps.dedupSimHashPairs(s, dir)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    val cc = connectedComponents(pairs)
    val w = Window.partitionBy(col("cluster_id"))
    cc.select(col("node").as("doc_id"), col("lab").as("cluster_id"))
      .withColumn("cluster_size", count(lit(1)).over(w))
      .withColumn("keep", (col("doc_id") === col("cluster_id")).cast("long"))
  }
}
