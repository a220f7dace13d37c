package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

/** Property tests for the corpus-curation operators (CurateOps) and the
  * as-of / range joins — invariants that hold at any scale factor, on
  * top of the DuckDB value-equality oracle the driver runs.
  */
class CurateSpec extends AnyFunSuite with BeforeAndAfterAll {
  val sf = "/root/testdata/sf0.001"
  var spark: SparkSession = _
  override def beforeAll(): Unit = { spark = GraftSession.local(4) }

  test("split_assign: deterministic hash split with full coverage") {
    val rows = CurateOps.splitAssign(spark, sf).collect()
    val docs = graft.sources.Tables.load(spark, sf, "documents").count()
    assert(rows.length == docs)
    assert(rows.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 100))
    val bySplit = rows.groupBy(_.getString(2)).view.mapValues(_.length).toMap
    // 80/10/10 by construction of the bucket ranges — allow hash noise
    assert(bySplit("train") > bySplit("val") && bySplit("train") > bySplit("test"))
    // split is a pure function of doc_id: two runs agree exactly
    val again = CurateOps.splitAssign(spark, sf).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      again.map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("txt_repetition: fractions are consistent and detect repeats") {
    val rows = CurateOps.txtRepetition(spark, sf).collect()
    rows.foreach { r =>
      val (n2, top2, n3, dup3) = (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5))
      assert(top2 <= n2 && dup3 <= n3 && dup3 >= 0)
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
      assert(r.getDouble(6) >= 0.0 && r.getDouble(6) <= 1.0)
    }
    // the synthetic corpus has a tiny vocabulary: repeated 3-grams must exist
    assert(rows.exists(_.getLong(5) > 0), "no repeated 3-grams detected")
  }

  test("txt_pii_scrub: every annotated doc yields exactly one hit per class") {
    val rows = CurateOps.txtPiiScrub(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == 1L, s"emails ${r.getLong(1)} for doc ${r.getLong(0)}")
      assert(r.getLong(2) == 1L, s"phones ${r.getLong(2)} for doc ${r.getLong(0)}")
      assert(r.getLong(3) == 1L, s"ips ${r.getLong(3)} for doc ${r.getLong(0)}")
    }
    // scrubbing is idempotent: re-scrubbing the scrubbed text changes
    // nothing, so scrubbed digests must be as numerous as docs (md5 set)
    assert(rows.map(_.getString(4)).toSet.size >= rows.length / 2)
  }

  test("dedup_decontaminate: exact duplicates of eval docs are flagged") {
    val flags = CurateOps.dedupDecontaminate(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    // training docs only, every one present
    assert(flags.keySet.forall(_ % 20 != 0))
    flags.values.foreach { case (nShared, flag) =>
      assert((flag == 1L) == (nShared > 0L))
    }
    // ground truth from exact dedup: a train doc whose text-fingerprint
    // group contains an eval doc shares ALL its 8-grams with the eval
    // set, so it MUST be contaminated (docs are long enough: >= 8 tokens)
    val groups = DedupOps.dedupExact(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byFp = groups.groupBy(_._2).values.filter(_.length > 1)
    val crossDup = byFp.flatMap { g =>
      val ids = g.map(_._1)
      if (ids.exists(_ % 20 == 0)) ids.filter(_ % 20 != 0) else Nil
    }.toSet
    crossDup.foreach { id =>
      assert(flags(id)._2 == 1L, s"exact dup of an eval doc not flagged: $id")
    }
  }

  test("emb_cluster_assign: total assignment, centroids self-assign") {
    val rows = CurateOps.embClusterAssign(spark, sf).collect()
    val n = graft.sources.Tables.load(spark, sf, "embeddings").count()
    assert(rows.length == n)
    assert(rows.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 8))
    rows.filter(_.getLong(0) < 8).foreach { r =>
      assert(r.getLong(1) == r.getLong(0), s"centroid ${r.getLong(0)} -> cell ${r.getLong(1)}")
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-9)
    }
  }

  test("as-of join: every purchase_us is the latest at-or-before the click") {
    val out = Events.qAsofJoin(spark, sf)
    assert(out.filter(col("purchase_us") > col("us")).isEmpty)
    assert(out.filter(col("lag_us") < 0).isEmpty)
    // cross-check one user against a window-free computation
    val ev = graft.sources.Tables.load(spark, sf, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).sorted).toMap
    val sample = out.filter(col("purchase_us").isNotNull).limit(20).collect()
    assert(sample.nonEmpty)
    sample.foreach { r =>
      val (u, us, pUs) = (r.getLong(0), r.getLong(2), r.getLong(3))
      val expected = purchases(u).filter(_ <= us).max
      assert(pUs == expected, s"user $u click@$us: got $pUs want $expected")
    }
  }

  test("range join: bucketing loses no pair and duplicates none") {
    val bucketed = Events.qRangeJoin(spark, sf)
      .select("user_id", "view_id", "click_id", "delta_us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // brute-force reference: plain inequality join, driver-side
    val ev = graft.sources.Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_id"), col("ts_us"), col("event_type")).collect()
    val views = ev.filter(_.getString(3) == "view")
    val clicks = ev.filter(_.getString(3) == "click")
    val brute = (for {
      v <- views; c <- clicks
      if c.getLong(0) == v.getLong(0)
      if c.getLong(2) >= v.getLong(2) && c.getLong(2) - v.getLong(2) <= 3600000000L
      if c.getLong(1) != v.getLong(1)
    } yield (v.getLong(0), v.getLong(1), c.getLong(1), c.getLong(2) - v.getLong(2))).toSet
    assert(bucketed.length == bucketed.toSet.size, "bucketed join emitted duplicates")
    assert(bucketed.toSet == brute,
      s"missing=${brute -- bucketed.toSet} extra=${bucketed.toSet -- brute}")
  }

  test("pack_sequences: distributed prefix sum equals the naive global window") {
    val out = CurateOps.curatePackSequences(spark, sf)
      .select("doc_id", "n_tokens", "tok_before").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // naive reference: running sum in doc_id order on the driver
    var running = 0L
    out.foreach { case (id, n, before) =>
      assert(before == running, s"doc $id: tok_before=$before, expected $running")
      running += n
    }
    assert(running == out.map(_._2).sum)
    // chunk arithmetic: a document starts in the sequence its first token lands in
    val packed = CurateOps.curatePackSequences(spark, sf).collect()
    packed.foreach { r =>
      val (before, n) = (r.getAs[Long]("tok_before"), r.getAs[Long]("n_tokens"))
      assert(r.getAs[Long]("start_seq") == before / 256)
      assert(r.getAs[Long]("start_offset") == before % 256)
      assert(r.getAs[Long]("end_seq") == (before + math.max(n, 1) - 1) / 256)
    }
  }

  test("pack_sequences: output is divisor-invariant and bucket table is bounded") {
    // the packing result must not depend on how the prefix sum buckets
    def snapshot(maxBuckets: Int) =
      CurateOps.curatePackSequences(spark, sf, maxBuckets = maxBuckets).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).toSet
    val ref = snapshot(4096)
    Seq(3, 7, 64).foreach { m => assert(snapshot(m) == ref, s"maxBuckets=$m diverged") }
    // the divisor bounds the bucket-prefix table at ANY id range: with
    // d = ceil(range / maxBuckets), distinct (doc_id div d) <= maxBuckets
    val docs = graft.sources.Tables.load(spark, sf, "documents")
    val b = docs.agg(min(col("doc_id")), max(col("doc_id"))).head()
    val range = b.getLong(1) - b.getLong(0) + 1
    Seq(3L, 7L, 64L, 4096L).foreach { m =>
      val d = math.max(1L, (range + m - 1) / m)
      val nBuckets = docs.select(expr(s"doc_id div ${d}L")).distinct().count()
      assert(nBuckets <= m, s"maxBuckets=$m produced $nBuckets buckets (divisor $d)")
    }
    // the DERIVED bucket count (default) matches the fixed-divisor ref
    assert(snapshot(0) == ref, "derived divisor diverged")
  }

  test("range divisor: derived bucket count scales with corpus size, balancing both window shapes") {
    // dense synthetic ids at n and 100n: per-(bucket) window rows ==
    // divisor, bucket-grid rows == range/divisor — √n keeps BOTH
    // ~√n instead of letting one grow linearly with the corpus
    for (n <- Seq(20000L, 2000000L)) {
      val ids = spark.range(n).select(col("id").as("doc_id"))
      val d = CurateOps.rangeDivisor(ids)
      val buckets = (n + d - 1) / d
      val root = math.round(math.sqrt(n.toDouble))
      val cap = math.max(root, 1024L) + 1
      assert(d <= cap, s"n=$n: per-bucket rows $d exceed ~max(sqrt,1024)=$cap")
      assert(buckets <= cap + 1, s"n=$n: bucket grid $buckets exceeds $cap")
      // and a 100x corpus must NOT inherit the small corpus's shape:
      // the fixed-1024 layout would put n/1024 rows in every in-bucket
      // window partition (2000 at 2M, 10^9 at 10^12)
      if (n >= 2000000L) assert(d < n / 1024,
        s"n=$n: derived divisor $d did not scale below the fixed-1024 shape")
    }
  }

  test("weighted_sample: matches driver-side E-S computation, weight-scale invariant") {
    val k = 20
    val got = CurateOps.curateWeightedSample(spark, sf, k).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(got.length == k)
    // brute-force replay of the exponential-clocks keys on the driver
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val md = java.security.MessageDigest.getInstance("MD5")
    val expect = docs.map { case (id, w) =>
      val hex = md.digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(hex.substring(0, 13), 16)
      val u = (h.toDouble + 1.0) / 4503599627370496.0
      (id, -math.log(u) / w.toDouble)
    }.sortBy { case (id, key) => (key, id) }.take(k).map(_._1)
    assert(got.sortBy(_._2).map(_._1).toSeq == expect.toSeq)
    // scaling every weight by a constant cannot change the sample
    val scaled = CurateOps.curateWeightedSample(spark, sf, k, wScale = 7.0).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(scaled == got.toSet)
  }

  test("char_lm_score: bounds hold and totals match a driver recount") {
    val rows = TextOps.txtCharLmScore(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, bits, avg) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(n > 0 && bits >= 0 && avg == (1000 * bits) / n)
      assert(avg <= 64000, s"avg surprisal out of range: $avg")
    }
    // recount one document's bigrams on the driver
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val someId = rows.head.getLong(0)
    val norm = docs(someId).toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
    assert(rows.head.getLong(1) == (norm.length - 1).toLong)
  }

  test("sample_stratified: exact per-stratum quota, deterministic") {
    val s1 = CurateOps.curateSampleStratified(spark, sf, k = 7).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val sizes = graft.sources.Tables.load(spark, sf, "documents")
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val perLang = s1.groupBy(_._2).view.mapValues(_.length).toMap
    sizes.foreach { case (lang, n) =>
      assert(perLang.getOrElse(lang, 0) == math.min(7L, n), s"stratum $lang")
    }
    // rank is 1..k and the sample is stable across runs
    assert(s1.groupBy(_._2).values.forall(g => g.map(_._3).sorted.toSeq == (1L to g.length)))
    val s2 = CurateOps.curateSampleStratified(spark, sf, k = 7).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(s1.toSet == s2.toSet)
  }

  test("budget_select: prefix property — selected docs dominate unselected") {
    val rows = CurateOps.curateBudgetSelect(spark, sf, budget = 5000L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.exists(_._4 == 1L) && rows.exists(_._4 == 0L), "budget should split the corpus")
    // greedy order: every selected doc sorts before every unselected one
    // in (n_tokens desc, doc_id), and tok_before is the exact prefix sum
    val ordered = rows.sortBy { case (id, n, _, _) => (-n, id) }
    var cum = 0L
    ordered.foreach { case (id, n, before, sel) =>
      assert(before == cum, s"doc $id prefix sum $before != $cum")
      assert(sel == (if (cum < 5000L) 1L else 0L), s"doc $id selection flag")
      cum += n
    }
  }

  test("corpus_shuffle: rank is a permutation of 0..n-1 in hash order") {
    val rows = CurateOps.curateCorpusShuffle(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.map(_._3).sorted.toSeq == (0L until rows.length).toSeq, "not a permutation")
    val byRank = rows.sortBy(_._3).map(x => (x._2, x._1))
    assert(byRank.toSeq == byRank.sortBy(identity).toSeq, "rank order != (hash, id) order")
  }

  test("resample_lang: quotas keep roughly the configured fraction per language") {
    val rows = CurateOps.curateResampleLang(spark, "/root/testdata/sf0.01").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(4)))
    rows.foreach { case (lang, bucket, kept) =>
      val quota = lang match { case "en" => 100L; case "zh" => 25L; case _ => 50L }
      assert(kept == (if (bucket < quota) 1L else 0L))
    }
    val en = rows.filter(_._1 == "en"); val zh = rows.filter(_._1 == "zh")
    assert(en.forall(_._3 == 1L), "en must be kept whole")
    val zhFrac = zh.count(_._3 == 1L).toDouble / zh.length
    assert(zhFrac > 0.05 && zhFrac < 0.5, s"zh kept fraction $zhFrac implausible for quota 25%")
  }

  test("emb_quantize: elements bounded by 127, max element saturates, scale positive") {
    val rows = CurateOps.embQuantize(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0, "scale must be positive for nonzero vectors")
      assert(r.getLong(4) >= 1, "the max-|x| element must land exactly on ±127")
      // qnorm <= 64 * 127^2 (64-dim), l1 <= 64 * 127
      assert(r.getLong(2) <= 64L * 127 * 127 && r.getLong(3) <= 64L * 127)
    }
  }

  test("top_terms: rarest-first ranking agrees with a driver-side recount") {
    val out = CurateOps.txtTopTerms(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty && out.forall(_._4 <= 3))
    // recount document frequency for the terms of one document
    val docsArr = graft.sources.Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.replaceAll("[^a-z0-9]+", " ")
        .trim.split(" ").filter(_.length >= 3).toSet)
    val someDoc = out.head._1
    out.filter(_._1 == someDoc).foreach { case (_, term, df, _) =>
      val expected = docsArr.count(_._2.contains(term))
      assert(df == expected, s"term '$term': df=$df, recount=$expected")
    }
  }

  test("bpe_train: merge sequence matches hand-computed BPE on a fixture") {
    // word histogram: aaab x2, ab x3, aaaaa x1 — hand-run of weighted BPE:
    //   r1: (a,a)=2*2+4=8 beats (a,b)=2+3=5        -> aa
    //   r2: (a,b)=5 beats (aa,a)=3, (aa,aa)=1      -> ab
    //   r3: (aa,ab)=2 beats (aa,aa)=1, (aa,a)=1    -> aaab
    //   r4: tie at 1 — 'aa|a' < 'aa|aa' lexically  -> aaa   (greedy
    //       left-to-right: aaaaa = [aa,aa,a] merges at (2,3) -> [aa,aaa])
    //   r5: (aa,aaa)=1                             -> aaaaa
    //   r6: no pairs left -> training stops at 5 merges
    val dir = java.nio.file.Files.createTempDirectory("bpe")
    val sess = spark
    import sess.implicits._
    Seq((0L, "aaab aaab ab ab ab aaaaa"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(dir.resolve("documents.parquet").toString)
    val merges = TextOps.txtBpeTrain(spark, dir.toString).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .sortBy(_._1)
    assert(merges.toSeq == Seq(
      (1, "a", "a", "aa", 8L),
      (2, "a", "b", "ab", 5L),
      (3, "aa", "ab", "aaab", 2L),
      (4, "aa", "a", "aaa", 1L),
      (5, "aa", "aaa", "aaaaa", 1L)),
      s"got: ${merges.toSeq}")
  }

  test("bpe_segment: pieces reconstruct each word; fixture fully merges") {
    // at sf0.001: every word's segmentation concatenates back to the word
    val seg = TextOps.txtBpeSegment(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(seg.nonEmpty)
    seg.foreach { case (word, cnt, nPieces, pieces) =>
      assert(pieces.replace(" ", "") == word, s"'$pieces' !~ '$word'")
      assert(nPieces == pieces.split(" ").length.toLong)
      assert(cnt > 0)
    }
    // the 5-merge fixture from the train test collapses every word to 1 piece
    val dir = java.nio.file.Files.createTempDirectory("bpeseg")
    val sess = spark
    import sess.implicits._
    Seq((0L, "aaab aaab ab ab ab aaaaa"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(dir.resolve("documents.parquet").toString)
    val fix = TextOps.txtBpeSegment(spark, dir.toString).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(fix == Map("aaab" -> 1L, "ab" -> 1L, "aaaaa" -> 1L), s"got: $fix")
  }

  test("quality_classify: totals match a driver-side recount, labels follow the threshold") {
    val wts = TextOps.QualityWeights.toMap
    val expected = graft.sources.Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map { r =>
        val toks = r.getString(1).toLowerCase.replaceAll("[^a-z0-9]+", " ")
          .trim.split(" ").filter(_.nonEmpty)
        val hitMilli = toks.flatMap(wts.get).sum
        (r.getLong(0), (toks.length.toLong, toks.count(wts.contains).toLong, hitMilli))
      }.toMap
    val out = TextOps.txtQualityClassify(spark, sf).collect()
    assert(out.length == expected.size)
    out.foreach { r =>
      val (nTok, nHits, hitMilli) = expected(r.getLong(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((nTok, nHits, hitMilli)))
      val keep = hitMilli >= TextOps.QualityThresholdMilli * nTok
      assert(r.getString(4) == (if (keep) "keep" else "drop"))
    }
  }

  test("source_overlap: bounds hold and one pair matches a set recount") {
    val out = CurateOps.curateSourceOverlap(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
    out.foreach { case ((a, b), (common, na, nb, jac)) =>
      assert(a < b)
      assert(common <= math.min(na, nb))
      assert(jac >= 0 && jac <= 1000)
    }
    // recount one pair's gram sets driver-side
    def grams(src: String): Set[String] =
      graft.sources.Tables.load(spark, sf, "documents")
        .filter(col("source") === src).select("text").collect()
        .flatMap { r =>
          val w = r.getString(0).toLowerCase.replaceAll("[^a-z0-9]+", " ").trim.split(" ")
          if (w.length < 8) Seq.empty else w.sliding(8).map(_.mkString(" ")).toSeq
        }.toSet
    out.headOption.foreach { case ((a, b), (common, na, nb, _)) =>
      val (ga, gb) = (grams(a), grams(b))
      assert((na, nb) == ((ga.size.toLong, gb.size.toLong)))
      assert(common == ga.intersect(gb).size.toLong)
    }
  }

  test("temperature_sample: min source kept whole, keep-rate flattens with size") {
    val rows = CurateOps.curateTemperatureSample(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val bySrc = rows.groupBy(_._2).map { case (src, rs) =>
      (src, rs.head._3, rs.count(_._4 == 1L).toLong)
    }.toSeq
    val nMin = bySrc.map(_._2).min
    // q = sqrt(n_min/n_s): the smallest source admits every document
    bySrc.filter(_._2 == nMin).foreach { case (src, n, kept) =>
      assert(kept == n, s"min-size source $src lost docs: $kept/$n")
    }
    // realized keep RATE decreases as source size grows (flattening);
    // md5-uniform concentration at these sizes keeps this deterministic
    val rates = bySrc.sortBy(_._2).map { case (_, n, kept) => kept.toDouble / n }
    rates.sliding(2).foreach { case Seq(a, b) => assert(b <= a + 0.1) case _ => }
    // and the flattened mix is no more skewed than the raw mix (equal
    // when the corpus is already uniform, as at this SF): max/min share
    val rawSkew = bySrc.map(_._2).max.toDouble / nMin
    val keptCounts = bySrc.map(_._3)
    val keptSkew = keptCounts.max.toDouble / keptCounts.min
    assert(keptSkew <= rawSkew, s"mix not flattened: $keptSkew vs $rawSkew")
  }

  test("quality drift: L1 distances match a driver recount; bounds hold") {
    val rows = CurateOps.curateQualityDrift(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val lens = graft.sources.Tables.load(spark, sf, "documents")
      .selectExpr("source",
        "size(filter(split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ')), ' '), t -> t <> '')) as dl")
      .collect().map(r => (r.getString(0), math.min(r.getInt(1).toLong / 32, 7L)))
    val n = lens.length.toLong
    val corpusPpm = lens.groupBy(_._2).view.mapValues(b => 1000000L * b.length / n).toMap
    rows.foreach { case (src, nDocs, l1) =>
      val mine = lens.filter(_._1 == src)
      assert(nDocs == mine.length.toLong)
      val byB = mine.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val want = (0L until 8L).filter(corpusPpm.contains).map { b =>
        math.abs(1000000L * byB.getOrElse(b, 0L) / nDocs - corpusPpm(b))
      }.sum
      assert(l1 == want, s"source $src: $l1 != $want")
      assert(l1 >= 0 && l1 <= 2000000L, "L1 of two distributions is within [0, 2e6] ppm")
    }
    assert(rows.map(_._2).sum == n, "every document counted exactly once")
  }

  test("leakfree split: no near-dup pair straddles a split boundary") {
    val split = CurateOps.curateSplitLeakfree(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(3))).toMap
    // THE guarantee: both ends of every near-dup pair share a split
    val pairs = DedupOps.dedupSimHashPairs(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "corpus should contain near-dup pairs")
    pairs.foreach { case (a, b) =>
      assert(split(a)._2 == split(b)._2,
        s"leak: pair ($a, $b) split across ${split(a)._2}/${split(b)._2}")
      assert(split(a)._1 == split(b)._1, "pair must share a cluster")
    }
    // every document is assigned, singletons route like splitAssign
    val n = graft.sources.Tables.load(spark, sf, "documents").count()
    assert(split.size == n)
    val plain = CurateOps.splitAssign(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val clustered = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    split.foreach { case (id, (cid, sp)) =>
      if (!clustered.contains(id)) {
        assert(cid == id, s"singleton $id must be its own cluster")
        assert(sp == plain(id), s"singleton $id must route like the per-doc split")
      }
    }
  }

  test("bm25: scores match a driver recount for every query") {
    val rows = TextOps.txtBm25TopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .selectExpr("doc_id",
        "filter(split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ')), ' '), t -> t <> '') as toks")
      .collect().map(r => (r.getLong(0), r.getSeq[String](1)))
    def flog2len(x: Long): Long = 64 - java.lang.Long.numberOfLeadingZeros(x) // len(bin(x))
    val dl = docs.map { case (id, ts) => id -> ts.length.toLong }.toMap
    val n = dl.size.toLong
    val avgdlMilli = 1000 * dl.values.sum / n
    val tf = docs.flatMap { case (id, ts) => ts.map(t => (id, t)) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val df = tf.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    def score(qid: Long): Seq[(Long, Long, Long)] = docs.flatMap { case (id, _) =>
      val hits = TextOps.Bm25Queries.toMap.apply(qid).filter(t => tf.contains((id, t)))
      if (hits.isEmpty) None else Some {
        val s = hits.map { t =>
          val idf = (flog2len(n + 1) - flog2len(df(t) + 1)) * 1000
          val tfv = tf((id, t))
          val dlnorm = 250 + (750 * dl(id) * 1000) / avgdlMilli
          val denom = tfv * 1000 + (1200 * dlnorm) / 1000
          idf * ((tfv * 2200 * 1000) / denom)
        }.sum
        (id, s, hits.length.toLong)
      }
    }.sortBy { case (id, s, _) => (-s, id) }.take(5).toSeq
    for ((qid, _) <- TextOps.Bm25Queries) {
      val want = score(qid)
      val have = rows.filter(_._1 == qid).sortBy(_._5).map(r => (r._2, r._3, r._4)).toSeq
      assert(have == want, s"qid=$qid\nhave=$have\nwant=$want")
    }
  }

  test("dsir_select: scores match a driver recount; target slice scores higher") {
    val rows = CurateOps.curateDsirSelect(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // driver recount of the full hashed-bucket model
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .selectExpr("doc_id", "lang",
        "filter(split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ')), ' '), t -> t <> '') as toks")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getSeq[String](2)))
    def bucket(tok: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(tok.getBytes("UTF-8"))
      (d.take(4).foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL))) % 64
    }
    def flog2(x: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(x)
    val all = docs.flatMap { case (id, lang, toks) => toks.map(t => (id, lang, bucket(t))) }
    val q = all.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val p = all.filter(_._2 == "en").groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val k = 1000L * (flog2(all.count(_._2 == "en") + 1L) - flog2(all.length + 1L))
    rows.foreach { case (id, nToks, score, avg, sel) =>
      val toks = docs.find(_._1 == id).get._3
      assert(nToks == toks.length)
      val w = toks.map { t =>
        val b = bucket(t)
        1000L * (flog2(p.getOrElse(b, 0L) + 1) - flog2(q(b) + 1))
      }.sum
      assert(score == w - nToks * k, s"doc $id: $score != ${w - nToks * k}")
      assert(avg == score / nToks, s"doc $id avg mismatch") // both truncate toward zero
      assert(sel == (if (score >= 0) 1L else 0L))
    }
    // the point of DSIR: the target (en) slice's mean importance score
    // exceeds the non-target mean (by construction of the weights)
    val en = rows.filter(r => docs.find(_._1 == r._1).get._2 == "en").map(_._4)
    val other = rows.filter(r => docs.find(_._1 == r._1).get._2 != "en").map(_._4)
    assert(en.nonEmpty && other.nonEmpty)
    assert(en.sum.toDouble / en.length > other.sum.toDouble / other.length,
      "target slice does not score higher — weights inverted?")
  }

  test("gopher gate: verdict is exactly the conjunction of its rule signals") {
    val rows = CurateOps.curateGopherGate(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.length == graft.sources.Tables.load(spark, sf, "documents").count(),
      "every document must get a verdict")
    rows.foreach { case (id, nTok, meanLen, alpha, top2, dup3, admitted) =>
      val want = (nTok >= 50 && nTok <= 100000 &&
        meanLen >= 3000 && meanLen <= 10000 &&
        alpha >= 800 && top2 <= 200 && dup3 <= 300)
      assert(admitted == (if (want) 1L else 0L), s"doc $id verdict drift")
      // milli signals live in their domains
      assert(alpha >= 0 && alpha <= 1000 && top2 >= 0 && top2 <= 1000 &&
        dup3 >= 0 && dup3 <= 1000)
    }
    // the corpus must be discriminative for the gate to mean anything
    assert(rows.exists(_._7 == 1L) && rows.exists(_._7 == 0L),
      "gate admits or rejects everything — thresholds not load-bearing")
  }

  private def tokensOf: Array[(Long, Seq[String])] =
    graft.sources.Tables.load(spark, sf, "documents")
      .selectExpr("doc_id",
        "filter(split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ')), ' '), t -> t <> '') as toks")
      .collect().map(r => (r.getLong(0), r.getSeq[String](1)))

  private def flog2(x: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(x)

  test("pmi collocations: top-20 matches a driver recount exactly") {
    val toks = tokensOf
    val uni = toks.flatMap(_._2).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nTokens = uni.values.sum
    val bg = toks.flatMap(_._2.sliding(2).filter(_.length == 2).map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.length.toLong).filter(_._2 >= 5)
    val want = bg.toSeq.map { case ((w1, w2), cab) =>
      (w1, w2, cab, flog2(cab) + flog2(nTokens) - flog2(uni(w1)) - flog2(uni(w2)))
    }.sortBy { case (w1, w2, cab, pmi) => (-pmi, -cab, w1, w2) }.take(20)
    val got = TextOps.txtPmiCollocations(spark, sf)
      .select("w1", "w2", "cnt_ab", "pmi_bits").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want, s"pmi drift: got ${got.take(3)} want ${want.take(3)}")
  }

  test("ngram diversity: per-source ratios match a driver recount") {
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .selectExpr("source",
        "filter(split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ')), ' '), t -> t <> '') as toks")
      .collect().map(r => (r.getString(0), r.getSeq[String](1)))
    val grams = docs.filter(_._2.length >= 2)
      .flatMap { case (src, ts) => ts.sliding(2).filter(_.length == 2).map(p => (src, p.mkString(" "))) }
    val want = grams.groupBy(_._1).map { case (src, gs) =>
      val total = gs.length.toLong
      val distinct = gs.map(_._2).distinct.length.toLong
      (src, distinct, total, 1000000L * distinct / total)
    }.toSet
    val got = TextOps.txtNgramDiversity(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want, s"diversity drift")
  }

  test("tfidf topk: ranked, self-free, within-probe scores non-increasing") {
    val rows = TextOps.txtTfidfTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (p, d, _, nTerms, rn) =>
      assert(p != d, "self-match must be excluded")
      assert(rn >= 1 && rn <= 3 && nTerms >= 1)
    }
    rows.groupBy(_._1).foreach { case (p, rs) =>
      val byRank = rs.sortBy(_._5)
      assert(byRank.map(_._5).toSeq == (1L to byRank.length).toSeq, s"probe $p rank gap")
      // ranks follow (score desc, doc_id asc)
      byRank.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3 > b._3 || (a._3 == b._3 && a._2 < b._2), s"probe $p misordered")
        case _ =>
      }
    }
  }

  test("datacard: every column replays from the per-doc signals") {
    val card = CurateOps.curateDatacard(spark, sf).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getString(6), r.getLong(7))).toSet
    val docsRaw = graft.sources.Tables.load(spark, sf, "documents")
      .selectExpr("doc_id", "source", "lang",
        "md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' '))) as fp")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    val gate = CurateOps.curateGopherGate(spark, sf)
      .selectExpr("doc_id", "n_tokens", "admitted").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val dupFps = docsRaw.groupBy(_._4).filter(_._2.length > 1).keySet
    val expected = docsRaw.groupBy(_._2).map { case (src, ds) =>
      val n = ds.length.toLong
      val langs = ds.groupBy(_._3).map { case (l, m) => (l, m.length.toLong) }
      val (topLang, topC) = langs.toSeq.minBy { case (l, c) => (-c, l) }
      (src, n, ds.map(d => gate(d._1)._1).sum,
        1000000L * ds.map(d => gate(d._1)._2).sum / n,
        1000000L * ds.count(d => dupFps.contains(d._4)) / n,
        langs.size.toLong, topLang, 1000000L * topC / n)
    }.toSet
    assert(card == expected, "datacard drifted from the per-doc replay")
    assert(card.toSeq.map(_._2).sum == docsRaw.length, "card must cover every doc")
  }

  test("boilerplate removal strikes a planted banner from every doc, content survives") {
    val sp = spark
    import sp.implicits._
    // synthetic corpus: every doc opens with the SAME 8-token banner
    // (license header / nav bar), then unique content
    val banner = "all rights reserved terms of service apply here"
    val docs = (0L until 40L).map { i =>
      val content = (0 until 16).map(j => s"w${i}x$j").mkString(" ")
      (i, s"$banner $content")
    }.toDF("doc_id", "text")
    val boiler = TextOps.boilerplateHashes(docs, width = 8, maxDf = 3)
    assert(boiler.count() == 1L, "exactly the banner segment is boilerplate")
    val cleaned = TextOps.boilerplateFilterWith(docs, boiler, width = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(cleaned.length == 40, "no doc may vanish — each has unique content")
    cleaned.foreach { case (id, nKept, text) =>
      assert(!text.contains("rights reserved"), s"doc $id kept the banner")
      assert(nKept == 2L && text.startsWith(s"w${id}x0"), s"doc $id lost content")
    }
  }

  test("grouped quality quantiles equal a per-source driver-side sort") {
    val got = CurateOps.curateQualityQuantiles(spark, sf).collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    val scored = TextOps.txtQualityClassify(spark, sf)
      .filter(col("n_tokens") > 0)
      .select(col("doc_id"), expr("(hit_milli + 2000 * n_tokens) div n_tokens - 2000").as("s"))
      .join(graft.sources.Tables.load(spark, sf, "documents").select("doc_id", "source"), Seq("doc_id"))
      .select("source", "s").collect().map(r => (r.getString(0), r.getLong(1)))
    scored.groupBy(_._1).foreach { case (src, rows) =>
      val vals = rows.map(_._2).sorted
      val n = vals.length
      for (q <- Seq(25, 50, 75)) {
        val ref = vals((((q.toLong * n + 99) / 100).toInt - 1).max(0))
        assert(got((src, q.toLong)) == ref,
          s"$src q$q: got ${got((src, q.toLong))}, sort says $ref over $n rows")
      }
    }
  }

  test("dedup weights: each cluster carries ~one doc of mass; singletons exactly 1") {
    val rows = CurateOps.curateDedupWeight(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // singletons (cluster_size 1) weigh exactly 1e6 ppm
    rows.filter(_._2 == 1L).foreach { case (id, _, w) =>
      assert(w == 1000000L, s"singleton $id weight $w")
    }
    // a cluster's total mass is size·(1e6 div size) — within integer-div
    // slack of one document's mass, never more
    rows.filter(_._2 > 1L).groupBy(_._2).foreach { case (sz, members) =>
      members.foreach { case (id, _, w) =>
        assert(w == 1000000L / sz, s"doc $id in cluster of $sz weighs $w")
      }
    }
    // coverage: every document gets a weight
    val docs = graft.sources.Tables.load(spark, sf, "documents").count()
    assert(rows.length == docs)
  }

  test("epoch allocation: cap respected, budget never exceeded, shares sum to ~1") {
    val rows = CurateOps.curateEpochs(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, nTok, share, target, epochs, planned) =>
      assert(epochs <= CurateOps.EpochCapMilli, s"$src epochs $epochs over cap")
      assert(epochs >= 0 && planned == epochs * nTok / 1000, s"$src planned mismatch")
      // uncapped sources plan to (almost) their target; capped ones fall short
      if (epochs < CurateOps.EpochCapMilli)
        assert(planned <= target, s"$src planned $planned over target $target")
    }
    val totalShare = rows.map(_._3).sum
    assert(totalShare > 990000L && totalShare <= 1000000L,
      s"target shares must sum to ~1e6 ppm (integer-div slack): $totalShare")
  }

  test("calibration buckets partition the scored corpus") {
    val cal = CurateOps.curateCalibration(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val scoredDocs = TextOps.txtQualityClassify(spark, sf)
      .filter(col("n_tokens") > 0).count()
    assert(cal.map(_._2).sum == scoredDocs, "every scored doc lands in one bucket")
    cal.foreach { case (b, n, adm, ppm) =>
      assert(b >= -5L && b <= 4L, s"bucket $b out of the clamped range")
      assert(adm <= n && ppm == 1000000L * adm / n)
    }
  }

  test("unimax water-fill: budget exact, caps respected, uncapped shares level") {
    val sess = spark
    import sess.implicits._
    // hand-built language grid: one tiny language that must cap, a mid
    // language near the water line, two large languages that must split
    // the leftover evenly (with a deterministic remainder)
    def check(grid: Seq[(String, Long)], budget: Long, epochCap: Long): Unit = {
      val out = CurateOps.unimaxOf(grid.toDF("lang", "tok_lang"), budget, epochCap)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5)))
      val totalCap = out.map(_._3).sum
      // allocations spend the budget exactly (or everything, if the
      // whole corpus fits), and never exceed a language's capacity
      assert(out.map(_._5).sum == math.min(budget, totalCap),
        s"alloc sum ${out.map(_._5).sum} budget $budget cap $totalCap")
      out.foreach { case (l, _, cap, capped, alloc, _) =>
        assert(alloc <= cap, s"$l alloc $alloc over capacity $cap")
        if (capped == 1L) assert(alloc == cap, s"$l capped but alloc $alloc != $cap")
      }
      // uncapped languages get level shares (within the ±1 remainder)
      val un = out.filter(_._4 == 0L).map(_._5)
      if (un.nonEmpty) assert(un.max - un.min <= 1L, s"shares not level: ${un.toSeq}")
      // capping is a prefix of the capacity-ascending order
      val byCap = out.sortBy(r => (r._3, r._1)).map(_._4)
      assert(!byCap.sliding(2).exists(p => p.length == 2 && p(0) == 0L && p(1) == 1L),
        s"capped set must be a capacity-ascending prefix: ${byCap.toSeq}")
    }
    check(Seq(("lo", 50L), ("mid", 400L), ("big_a", 5000L), ("big_b", 7000L)),
      budget = 3000L, epochCap = 2L)
    check(Seq(("lo", 50L), ("mid", 400L), ("big_a", 5000L), ("big_b", 7000L)),
      budget = 100000L, epochCap = 2L) // everything fits: all capped
    check(Seq(("a", 10L), ("b", 10L), ("c", 10L)), budget = 17L, epochCap = 1L)
    // and over the real corpus: the oracle-checked defaults
    val real = CurateOps.curateUnimax(spark, sf).collect()
    assert(real.nonEmpty && real.map(_.getLong(4)).sum <=
      math.min(30000L, real.map(_.getLong(2)).sum))
  }

  test("char entropy: floored-bits driver replay; spam scores low, uniform scores high") {
    val sess = spark
    import sess.implicits._
    // planted tails: single-symbol spam must floor at 0 bits; a
    // one-of-each alphabet doc is maximally uniform (36·(bitlen(36)−1)
    // = 180 bits over 36 chars = 5000 millibits > the 4500 high bar)
    val dir = java.nio.file.Files.createTempDirectory("entropy")
    Seq((1L, "aaaa aaaa aaaa aaaa"),
        (2L, "abcdefghijklmnopqrstuvwxyz 0123456789"),
        (3L, "some ordinary sentence with plain words in it"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(dir.resolve("documents.parquet").toString)
    val planted = TextOps.txtCharEntropy(spark, dir.toString).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(planted(1L)._1 == 0L && planted(1L)._3 == 1L, s"spam: ${planted(1L)}")
    assert(planted(2L)._2 == 5000L && planted(2L)._4 == 1L, s"uniform: ${planted(2L)}")
    assert(planted(3L)._3 == 0L, s"natural text must not read as spam: ${planted(3L)}")

    // full driver replay over the real corpus: the floored-bits
    // identity H = n·bitlen(n) − Σ c·bitlen(c), recomputed in Scala
    def bitlen(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)
    val expected = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect().flatMap { r =>
        val norm = r.getString(1).toLowerCase(java.util.Locale.ROOT)
          .replaceAll("[^a-z0-9]+", " ").trim.replace(" ", "")
        if (norm.isEmpty) None
        else {
          val counts = norm.groupBy(identity).map(_._2.length.toLong)
          val n = counts.sum
          Some(r.getLong(0) -> (n * bitlen(n) - counts.map(c => c * bitlen(c)).sum))
        }
      }.toMap
    val actual = TextOps.txtCharEntropy(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(actual == expected, "floored-bits entropy must replay exactly")
  }

  test("l-diversity: homogeneous class is k-anonymous yet fails; corpus invariants hold") {
    val sess = spark
    import sess.implicits._
    // planted homogeneity attack: one QI class of 10 docs (well past
    // k = 5) where every member carries the SAME sensitive topic — the
    // exact disclosure k-anonymity cannot see. TopicLexicon terms make
    // the topic deterministic; a second class mixes topics.
    val sports = "join hash scan table row query join hash scan table"
    val mixed = Seq("agg group sort order filter", "stream batch window line")
    val dir = java.nio.file.Files.createTempDirectory("ldiv")
    ((1 to 10).map(i => (i.toLong, "en", "web", sports)) ++
      (1 to 10).map(i => (100L + i, "en", "books", mixed(i % 2))))
      .toDF("doc_id", "lang", "source", "text")
      .write.mode("overwrite").parquet(dir.resolve("documents.parquet").toString)
    val planted = CurateOps.curateLDiversity(spark, dir.toString, l = 2L).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    val k = CurateOps.curateKAnonymity(spark, dir.toString).collect()
    assert(k.forall(_.getLong(5) == 0L), "both planted classes are k-anonymous")
    assert(planted(("en", "web")) == ((10L, 1L, 1000000L, 0L)),
      s"homogeneous class must fail l-diversity: ${planted(("en", "web"))}")
    val (bSize, bDistinct, bShare, bDiverse) = planted(("en", "books"))
    assert(bSize == 10L && bDistinct == 2L && bDiverse == 1L && bShare == 500000L,
      s"mixed class: ${planted(("en", "books"))}")

    // corpus invariants: classes partition the corpus; shares bounded;
    // the verdict is exactly the distinct-count rule
    val rows = CurateOps.curateLDiversity(spark, sf).collect()
    val docsN = graft.sources.Tables.load(spark, sf, "documents").count()
    assert(rows.map(_.getLong(3)).sum == docsN, "classes must partition the corpus")
    rows.foreach { r =>
      assert(r.getLong(4) >= 1L && r.getLong(4) <= r.getLong(3))
      assert(r.getLong(5) >= (1000000L / math.max(r.getLong(4), 1L)) &&
        r.getLong(5) <= 1000000L)
      assert((r.getLong(6) == 1L) == (r.getLong(4) >= 3L))
    }
  }

  test("t-closeness: planted skew class passes l-diversity yet fails; floored TV is exact") {
    val sess = spark
    import sess.implicits._
    val analytics = "agg group sort order filter"
    val relational = "join hash scan table row query"
    val streaming = "stream batch window line"
    val dir = java.nio.file.Files.createTempDirectory("tclose")
    // corpus: 40 docs; global topic shares analytics 31/40, relational
    // 8/40, streaming 1/40. Class (en, books) holds 3 DISTINCT topics
    // (l-diverse at l = 3) but its distribution is 80% relational —
    // the skewness attack l-diversity cannot see.
    ((1 to 30).map(i => (i.toLong, "en", "web", analytics)) ++
      (1 to 8).map(i => (100L + i, "en", "books", relational)) ++
      Seq((109L, "en", "books", analytics), (110L, "en", "books", streaming)))
      .toDF("doc_id", "lang", "source", "text")
      .write.mode("overwrite").parquet(dir.resolve("documents.parquet").toString)
    val ld = CurateOps.curateLDiversity(spark, dir.toString).collect()
      .map(r => r.getString(1) -> r.getLong(6)).toMap
    assert(ld("books") == 1L, "the books class IS l-diverse (3 topics)")
    val tc = CurateOps.curateTCloseness(spark, dir.toString).collect()
      .map(r => r.getString(1) -> (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // hand-computed floored-ppm TV: books (|800000-200000| +
    // |100000-775000| + |100000-25000|) div 2 = 675000 > 500000;
    // web (225000 + 200000 + 25000) div 2 = 225000 <= 500000
    assert(tc("books") == ((10L, 675000L, 0L)), s"skewed class: ${tc("books")}")
    assert(tc("web") == ((30L, 225000L, 1L)), s"modal class: ${tc("web")}")

    // corpus invariants: TV bounded by [0, 1e6]; classes partition the
    // corpus; verdict is exactly the threshold rule
    val rows = CurateOps.curateTCloseness(spark, sf).collect()
    val docsN = graft.sources.Tables.load(spark, sf, "documents").count()
    assert(rows.map(_.getLong(3)).sum == docsN)
    rows.foreach { r =>
      assert(r.getLong(4) >= 0L && r.getLong(4) <= 1000000L)
      assert((r.getLong(5) == 1L) == (r.getLong(4) <= 500000L))
    }
  }

  test("mojibake: planted encoding artifacts hit the right counters; clean text passes") {
    val sess = spark
    import sess.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mojibake")
    Seq(
      (1L, "a clean café sentence with correct accents — and a dash"),
      (2L, "double-encoded cafÃ© and rÃ©sumÃ© here"), // Ã© ×3
      (3L, "cp1252 mangle: â€œquotedâ€ and â€™s"), // â€ ×3
      (4L, "decoder gave up � twice �"),
      (5L, "binary spill \u0001 control \u001F chars \u0007"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(dir.resolve("documents.parquet").toString)
    val m = TextOps.txtMojibake(spark, dir.toString).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(8))).toMap
    // clean text — including a REAL é and an em dash — must not trip
    assert(m(1L) == ((0L, 0L, 0L, 0L, 0L, 0L)), s"clean: ${m(1L)}")
    assert(m(2L)._1 == 3L && m(2L)._6 == 1L, s"latin1 sigs: ${m(2L)}")
    assert(m(3L)._2 == 3L && m(3L)._6 == 1L, s"double-enc sigs: ${m(3L)}")
    assert(m(4L)._3 == 2L && m(4L)._6 == 1L, s"replacement chars: ${m(4L)}")
    assert(m(5L)._4 == 3L && m(5L)._6 == 1L, s"control chars: ${m(5L)}")
    // the real corpus is clean: the gate must not flag anything
    val real = TextOps.txtMojibake(spark, sf)
    assert(real.filter(col("mojibake") > 0L).isEmpty, "corpus must pass the gate")
  }

  test("c4 gate: each line rule and page rule fires exactly where Raffel §2.2 says") {
    val sess = spark
    import sess.implicits._
    val dir = java.nio.file.Files.createTempDirectory("c4gate")
    val goodPage = (1 to 6).map(i => s"This is proper sentence number $i.").mkString("\n")
    Seq(
      (1L, goodPage), // 6 kept lines, 6 sentences → keep
      (2L, goodPage + "\nno terminal punctuation here\nonly two. words?\n" +
        "Please enable javascript to view this page."), // extra lines all drop
      (3L, goodPage + " { code block }"), // brace → page drop
      (4L, goodPage + "\nLorem Ipsum dolor sit amet."), // filler → page drop
      (5L, "Too short. Just two sentences here."))      // < 5 sentences → drop
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(dir.resolve("documents.parquet").toString)
    val g = TextOps.txtC4Gate(spark, dir.toString).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    assert(g(1L) == ((6L, 6L, 6L, 0L, 0L, 1L)), s"good page: ${g(1L)}")
    // line rules: "no terminal punctuation" fails the $-anchor rule,
    // "only two. words?" has < 3 tokens... wait it has 3 — it ends in
    // '?' and has exactly 3 tokens so it is KEPT; the javascript line
    // ends in '.' with 7 tokens but mentions javascript → dropped
    assert(g(2L)._1 == 9L && g(2L)._2 == 7L, s"line rules: ${g(2L)}")
    assert(g(2L)._6 == 1L, "page with enough kept sentences survives")
    assert(g(3L)._5 == 1L && g(3L)._6 == 0L, s"brace drops the page: ${g(3L)}")
    assert(g(4L)._4 == 1L && g(4L)._6 == 0L, s"lorem ipsum drops the page: ${g(4L)}")
    assert(g(5L)._3 == 2L && g(5L)._6 == 0L, s"sentence minimum: ${g(5L)}")
  }

  test("fertility covers every word occurrence; whole-word share consistent") {
    val rows = TextOps.txtFertility(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // the BPE vocabulary is trained on this corpus, so every word
    // occurrence must be covered by the segment join
    val totalOcc = graft.sources.Tables.load(spark, sf, "documents")
      .select(explode(split(TextOps.normalized(col("text")), " ")).as("w"))
      .filter(col("w") =!= "").count()
    assert(rows.map(_._2).sum == totalOcc, "fertility join dropped word occurrences")
    rows.foreach { case (lang, nw, np, fert, whole) =>
      assert(np >= nw, s"$lang: pieces below words")
      assert(fert == 1000L * np / nw && fert >= 1000L, s"$lang fertility $fert")
      assert(whole >= 0L && whole <= 1000000L)
    }
  }

  test("source concentration: exact Gini/HHI against a driver replay") {
    val row = CurateOps.curateSourceConcentration(spark, sf).collect()(0)
    val counts = graft.sources.Tables.load(spark, sf, "documents")
      .groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).sortBy(t => (t._2, t._1))
    val n = counts.size.toLong
    val tot = counts.map(_._2).sum
    val giniNum = counts.zipWithIndex.map { case ((_, x), i0) =>
      (2L * (i0 + 1) - n - 1) * x
    }.sum
    assert(row.getLong(0) == n)
    assert(row.getLong(1) == 1000000L * counts.map(_._2).max / tot)
    assert(row.getLong(2) == 1000000L * giniNum / (n * tot))
    assert(row.getLong(3) == 1000000L * counts.map(x => x._2 * x._2).sum / (tot * tot))
    // sanity bands: Gini in [0, 1), HHI >= 1/n (uniform floor)
    assert(row.getLong(2) >= 0L && row.getLong(2) < 1000000L)
    assert(row.getLong(3) >= 1000000L / n)
  }

  test("dp release: thresholds partition the draw space; mechanism bounded + calibrated") {
    // (a) the inverse-CDF table tiles [0, 3·2^31) with no gap/overlap
    val thr = CurateOps.DpGeomThresholds
    assert(thr.head._2 == 0L && thr.last._3 == 3L * (1L << 31))
    thr.sliding(2).foreach { case Seq((_, _, hi), (_, lo, _)) => assert(hi == lo) }
    assert(thr.map(_._1) == (-16L to 16L))
    // symmetric masses: P(k) == P(-k)
    val mass = thr.map { case (k, lo, hi) => k -> (hi - lo) }.toMap
    (1L to 16L).foreach(k => assert(mass(k) == mass(-k)))
    assert(mass(0L) == (1L << 31))

    // (b) the released table: bounded noise, nonneg counts, exact clamp
    val rel = CurateOps.curateDpRelease(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val truth = graft.sources.Tables.load(spark, sf, "documents")
      .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(rel.keySet == truth.keySet)
    rel.foreach { case (k, n) =>
      assert(n >= 0L, s"$k released negative")
      assert(math.abs(n - truth(k)) <= 16L, s"$k noise out of bounds")
    }

    // (c) calibration: over many synthetic cells the keyed-hash draw
    // lands noise=0 with frequency ~ 1/3 and |noise|<=1 with ~ 2/3
    // (exact masses 1/3 and 2/3 at alpha=1/2)
    val s2 = spark
    import s2.implicits._
    val many = (0 until 4096).map(i => s"cell$i").toDF("source")
      .withColumn("lang", lit("xx"))
      .withColumn("t",
        expr("CAST(conv(substring(md5(concat('dpv1:', source, ':', lang)), 1, 8), 16, 10) AS BIGINT)")
          .bitwiseAND(lit(2147483647L)) * lit(3L))
      .join(broadcast(thr.toDF("noise", "lo", "hi")),
        col("t") >= col("lo") && col("t") < col("hi"))
      .groupBy(col("noise")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = many.values.sum.toDouble
    val p0 = many.getOrElse(0L, 0L) / n
    val p1 = (many.getOrElse(-1L, 0L) + many.getOrElse(0L, 0L) + many.getOrElse(1L, 0L)) / n
    assert(math.abs(p0 - 1.0 / 3) < 0.03, s"P(0) = $p0")
    assert(math.abs(p1 - 2.0 / 3) < 0.03, s"P(|Z|<=1) = $p1")
    // no mass escapes the truncation
    assert(many.keys.forall(k => k >= -16L && k <= 16L))
  }

  test("dp release DRBG path: noise histogram matches the exact dyadic masses (chi-squared)") {
    // the PRODUCTION noise source (SecureRandom-backed), drawn through
    // the same public seam the operator uses — 3·10⁶ draws keep the
    // rarest buckets (±16, expected mass 2¹⁶/(3·2³¹)) at ~30 expected
    // observations, enough for a chi-squared fit over all 33 buckets
    val n = 3000000
    val counts = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    var i = 0
    while (i < n) {
      val z = CurateOps.dpGeomNoiseOf(CurateOps.dpSecureDraw())
      counts(z) += 1L
      i += 1
    }
    val total = 3.0 * (1L << 31)
    val chi2 = CurateOps.DpGeomThresholds.map { case (k, lo, hi) =>
      val exp = n * (hi - lo) / total
      val obs = counts(k).toDouble
      (obs - exp) * (obs - exp) / exp
    }.sum
    // df = 32; chi2_{32} has 99.99th percentile ~ 66 — 80 keeps the
    // flake rate ~ 1e-6 while still catching any mis-calibrated bucket
    assert(chi2 < 80.0, s"chi-squared $chi2 over 33 buckets — DRBG noise mis-calibrated")
    assert(counts.keys.forall(k => k >= -16L && k <= 16L))

    // and the DataFrame path under the seam: bounded noise, exact cell
    // set, schema identical to the replay-device release
    val rel = CurateOps.curateDpRelease(spark, sf, CurateOps.DpSecureDrbg).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val truth = graft.sources.Tables.load(spark, sf, "documents")
      .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(rel.keySet == truth.keySet)
    rel.foreach { case (k, v) =>
      assert(v >= 0L && math.abs(v - truth(k)) <= 16L, s"$k DRBG noise out of bounds")
    }
  }
}
