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

/** Stage decomposition of the multimodal phash pipeline (dev tool):
  * `sbt "runMain graft.tools.ProfileMm [sfDir]"`.
  */
object ProfileMm {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(32)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val sig = graft.operators.Multimodal.mmPhash(spark, dir)
      .select(col("doc_id"), col("phash"))
    time("signatures")(sig.count())
    time("signatures again")(sig.count())
    val cached = sig.cache()
    time("signatures cache fill")(cached.count())
    val pairs = graft.operators.DedupOps.hammingPairs(cached, "phash", 8)
    time("hamming pairs (radius 8)")(pairs.count())
    time("hamming pairs warm")(pairs.count())
    val cc = graft.operators.GraphOps.connectedComponents(
      pairs.select(col("doc_a").as("src"), col("doc_b").as("dst")))
    time("connected components")(cc.count())
    time("mm_canonical full")(graft.operators.Multimodal.mmCanonical(spark, dir).count())
    time("mm_canonical warm")(graft.operators.Multimodal.mmCanonical(spark, dir).count())
    spark.stop()
  }
}

/** Pair-vs-triple hamming multi-index probe (dev tool):
  * `sbt "runMain graft.tools.ProfileHamming [sfDir]"` — for the mm
  * phash corpus at radius 8, measures per index arm the explode
  * fanout (keyed rows), the candidate-join volume Σ C(n_bucket, 2)
  * over (ci, chunk) buckets (the exact number of same-bucket ordered
  * pairs the equi-join materializes before the bit_count verify), and
  * the wall time of the full exact pair query. The escalation story in
  * numbers: pair buckets grow ∝ N/2^12 so candidate volume bends
  * quadratic; triple keys pay a ~3.7× fanout constant to keep it flat.
  */
object ProfileHamming {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(32)
    import graft.operators.DedupOps
    val sig = graft.operators.Multimodal.mmPhash(spark, dir)
      .select(col("doc_id"), col("phash")).cache()
    val n = sig.count()
    println(s"corpus: $dir, $n signatures")
    def volume(chunked: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val byBucket = chunked.groupBy(col("ci"), col("chunk"))
        .agg(count(lit(1)).as("nb"))
      val r = byBucket.agg(
        sum(col("nb")).as("rows"),
        sum(expr("(nb * (nb - 1)) div 2")).as("cand")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    for (arm <- Seq("pair", "triple")) {
      val chunked =
        if (arm == "pair") DedupOps.chunkPairSigs(sig, "phash", 8)
        else DedupOps.chunkTripleSigs(sig, "phash", 8)
      val (fanout, cand) = volume(chunked)
      val t0 = System.nanoTime()
      val nPairs = DedupOps.hammingPairs(sig, "phash", 8,
        nRows = Some(if (arm == "triple") Long.MaxValue else 0L)).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$arm%-7s fanout_rows=$fanout%12d candidates=$cand%14d pairs=$nPairs%9d wall=$sec%7.2f s")
    }
    spark.stop()
  }
}

/** Stage decomposition of the exact knn-graph pipeline (dev tool):
  * `sbt "runMain graft.tools.ProfileKnn [sfDir]"` times the block
  * join, the directed scoring pass, and the two top-k spellings
  * (bounded knn_topk aggregate vs row_number window) in isolation.
  */
object ProfileKnn {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.expressions.Window
    import graft.operators.SimilarityOps
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(32)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val e = SimilarityOps.quantized(spark, dir)
    val pairs = SimilarityOps.triangularPairs(e, nBlocks = 8)
    time("pairs count")(pairs.count())
    time("pairs count warm")(pairs.count())
    val directed = pairs.select(col("ida").as("src"), col("idb").as("nbr"),
        col("dot"), col("na").as("ns"), col("nb").as("nn"))
      .unionByName(pairs.select(col("idb").as("src"), col("ida").as("nbr"),
        col("dot"), col("nb").as("ns"), col("na").as("nn")))
      .withColumn("cos", col("dot") / (sqrt(col("ns")) * sqrt(col("nn"))))
    time("directed count (2x join)")(directed.count())
    val agged = directed.groupBy(col("src"))
      .agg(graft.functions.TopKByAgg.knnTopK(col("cos"), col("nbr"), col("dot"), 5).as("nb"))
    time("knn_topk aggregate")(agged.count())
    time("knn_topk aggregate warm")(agged.count())
    val w = Window.partitionBy(col("src")).orderBy(col("cos").desc, col("nbr"))
    val windowed = directed.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
    time("row_number window")(windowed.count())
    // single-pass spelling: each scored pair explodes into both
    // directions — half the join/dot work, one Generate
    val exploded = pairs.select(explode(array(
        struct(col("ida").as("src"), col("idb").as("nbr"), col("dot"),
          col("na").as("ns"), col("nb").as("nn")),
        struct(col("idb").as("src"), col("ida").as("nbr"), col("dot"),
          col("nb").as("ns"), col("na").as("nn")))).as("e"))
      .select(col("e.*"))
      .withColumn("cos", col("dot") / (sqrt(col("ns")) * sqrt(col("nn"))))
      .groupBy(col("src"))
      .agg(graft.functions.TopKByAgg.knnTopK(col("cos"), col("nbr"), col("dot"), 5).as("nb"))
    time("explode + knn_topk")(exploded.count())
    time("explode + knn_topk warm")(exploded.count())
    spark.stop()
  }
}

/** Stage decomposition of the exact-quantile machinery (dev tool):
  * `sbt "runMain graft.tools.ProfileQuantiles [sfDir]"`.
  */
object ProfileQuantiles {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(32)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val li = graft.sources.Tables.load(spark, dir, "lineitem")
    val cents = expr("cast(round(l_extendedprice * 100) as bigint)")
    val vals = li.select(cents.cast("long").as("__v")).filter(col("__v").isNotNull)
    time("min/max/count")(vals.agg(min(col("__v")), max(col("__v")), count(lit(1))).head())
    time("min/max/count warm")(vals.agg(min(col("__v")), max(col("__v")), count(lit(1))).head())
    val mm = vals.agg(min(col("__v")), max(col("__v"))).head()
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    val width = math.max(1L, (hi - lo) / (1L << 16) + 1)
    time("coarse histogram collect")(
      vals.select(expr(s"(__v - ${lo}L) div ${width}L").as("b"))
        .groupBy(col("b")).agg(count(lit(1)).as("cnt")).collect().length)
    time("coarse histogram warm")(
      vals.select(expr(s"(__v - ${lo}L) div ${width}L").as("b"))
        .groupBy(col("b")).agg(count(lit(1)).as("cnt")).collect().length)
    time("quantity quantiles")(
      graft.operators.ScaleOps.exactQuantiles(li, col("l_quantity"), Seq(25, 50, 75, 99)))
    time("cents quantiles")(
      graft.operators.ScaleOps.exactQuantiles(li, cents, Seq(25, 50, 75, 99)))
    time("cents quantiles warm")(
      graft.operators.ScaleOps.exactQuantiles(li, cents, Seq(25, 50, 75, 99)))
    time("full q_exact_quantiles")(
      graft.operators.ScaleOps.qExactQuantiles(spark, dir).count())
    time("full q_exact_quantiles warm")(
      graft.operators.ScaleOps.qExactQuantiles(spark, dir).count())
    spark.stop()
  }
}

/** Stage decomposition of curate_filter_ensemble (dev tool). */
object ProfileEnsemble {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(32)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    import graft.operators._
    val clf = TextOps.txtQualityClassify(spark, dir)
      .select(col("doc_id"), (col("label") === "keep").cast("long").as("clf_keep"))
    val gate = CurateOps.curateGopherGate(spark, dir).select(col("doc_id"), col("admitted"))
    val ccnet = TextOps.txtCcnetBuckets(spark, dir).select(col("doc_id"), col("bucket"))
    time("clf")(clf.count()); time("clf warm")(clf.count())
    time("gate")(gate.count()); time("gate warm")(gate.count())
    time("ccnet")(TextOps.txtCcnetBuckets(spark, dir).count())
    time("ccnet warm")(TextOps.txtCcnetBuckets(spark, dir).count())
    val joined = clf.join(gate, Seq("doc_id"))
      .join(TextOps.txtCcnetBuckets(spark, dir).select(col("doc_id"), col("bucket")), Seq("doc_id"))
    time("joined")(joined.count()); time("joined warm")(joined.count())
    time("full ensemble")(CurateOps.curateFilterEnsemble(spark, dir).count())
    time("full ensemble warm")(CurateOps.curateFilterEnsemble(spark, dir).count())
    time("full ensemble warm2")(CurateOps.curateFilterEnsemble(spark, dir).count())
    spark.stop()
  }
}

/** Stage decomposition of the graph family (dev tool): separates plan
  * analysis/optimization time (driver, single-threaded) from execution
  * for the iterative queries whose lineage grows per round.
  */
object ProfileGraph {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(32)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    import graft.operators._
    // warm JIT + caches with one full pass of each
    time("kcore cold")(GraphOps.graphKCore(spark, dir).count())
    time("linkpred cold")(GraphOps.graphLinkPred(spark, dir).count())
    time("pagerank cold")(GraphOps.graphPageRank(spark, dir).count())
    time("labelprop cold")(GraphOps.graphLabelProp(spark, dir).count())
    for (i <- 1 to 2) {
      // plan-vs-execute split: building the DF + forcing executedPlan
      // is pure driver work; the count() then pays only execution
      val lp = time(s"linkpred build+plan $i") {
        val df = GraphOps.graphLinkPred(spark, dir)
        df.queryExecution.executedPlan
        df
      }
      time(s"linkpred execute $i")(lp.count())
      val pr = time(s"pagerank build+plan $i") {
        val df = GraphOps.graphPageRank(spark, dir)
        df.queryExecution.executedPlan
        df
      }
      time(s"pagerank execute $i")(pr.count())
      val kc = time(s"kcore build+plan $i") {
        val df = GraphOps.graphKCore(spark, dir)
        df.queryExecution.executedPlan
        df
      }
      time(s"kcore execute $i")(kc.count())
      val lb = time(s"labelprop build+plan $i") {
        val df = GraphOps.graphLabelProp(spark, dir)
        df.queryExecution.executedPlan
        df
      }
      time(s"labelprop execute $i")(lb.count())
    }
    spark.stop()
  }
}
