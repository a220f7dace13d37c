package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

import graft.exec.RelationStore

/** Structured Streaming surface (SURVEY.md §2.7): the reference's
  * microbatch incremental semantics mapped onto a true stream.
  *
  *  - tumbling windows  = `window(ts, batchSize)` groupBy
  *  - late data         = `withWatermark(ts, lookback)`
  *  - checkpoint        = Spark's own streaming checkpoint dir
  *  - per-batch commit  = `foreachBatch` → incremental merge into the
  *    RelationStore (idempotent by key, so retries are safe)
  *  - Trigger.AvailableNow = "process everything that has landed, then
  *    stop" — the exact execution contract of a scheduled microbatch
  *    run, but with streaming bookkeeping
  *
  * Source layout matches the batch engine: a directory of parquet files
  * (at 100 TB: a partitioned landing zone written by upstream
  * producers; the file source discovers new files per trigger).
  */
object Streaming {
  /** events schema as landed by upstream producers. `readStream`
    * requires a declared schema, but the `ts` physical type has ALREADY
    * flipped once across testdata generations (TIMESTAMP(NANOS) scanned
    * as long vs TIMESTAMP(MICROS) as NTZ — see Tables.normalizeEventTs),
    * so a hard-coded type would break streaming reads silently on the
    * next regeneration while batch kept working. Instead the schema is
    * DERIVED from a one-file batch scan of the same directory — a
    * driver-side footer read, no data pass — so stream and batch always
    * agree on the physical type and `normalizeEventTs` handles either.
    */
  def eventsSchemaOf(spark: SparkSession, inputDir: String): StructType =
    // consumer-before-producer startup: with no file landed yet there is
    // nothing to scan, so fall back to the static current-generation
    // schema (NTZ micros) — the stream starts and waits; once files
    // exist, restarts always re-derive from the actual physical type
    try spark.read.parquet(inputDir).schema
    catch {
      case _: org.apache.spark.sql.AnalysisException => StructType(Seq(
        StructField("event_id", LongType),
        StructField("ts", TimestampNTZType),
        StructField("user_id", LongType),
        StructField("event_type", StringType),
        StructField("value", DoubleType),
        StructField("props", StringType)))
    }

  /** readStream over an events directory; ts normalized to `ts_us`
    * (integer µs) + `ts_t` (timestamp) via the same type-driven rule
    * the batch loader uses — stateless projections, so the streaming
    * plan is identical to batch upstream of any stateful operator.
    */
  def eventStream(spark: SparkSession, inputDir: String): DataFrame =
    graft.sources.Tables.normalizeEventTs(
      spark.readStream
        .schema(eventsSchemaOf(spark, inputDir))
        .parquet(inputDir))

  /** Windowed aggregate with watermark: per-day, per-type counts +
    * exact cent sums. Watermark bounds state exactly like the
    * reference's `lookback` bounds reprocessing.
    */
  def dailyCounts(events: DataFrame, watermark: String = "1 day"): DataFrame =
    events
      .withWatermark("ts_t", watermark)
      .groupBy(window(col("ts_t"), "1 day"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("sum_value_cents"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("n"), col("sum_value_cents"))

  /** Run a streaming aggregate to completion over the currently
    * available files and merge each micro-batch into the store
    * (upsert on key columns → idempotent across retries).
    */
  def runAvailableNow(
      agg: DataFrame,
      store: RelationStore,
      table: String,
      keys: Seq[String],
      checkpointDir: String): Unit = {
    val q = agg.writeStream
      .outputMode(OutputMode.Complete())
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (store.exists(table)) {
          val target = store.read(table)
          val kept = target.join(batch.select(keys.map(col): _*).distinct(), keys, "left_anti")
          store.write(kept.unionByName(batch), table)
        } else store.write(batch, table)
      }
      .start()
    q.awaitTermination()
  }

  // ---- custom stateful operator: streaming sessionization ----

  final case class SessionState(lastUs: Long, sessions: Long, events: Long)
  final case class SessionUpdate(user_id: Long, n_sessions: Long, n_events: Long)

  /** flatMapGroupsWithState sessionization: a new session begins after
    * `gapUs` of silence per user. The streaming twin of the batch
    * `qSessionize` operator (graft.operators.Events) — state is one
    * (lastTs, counts) record per user, so memory is O(users), not
    * O(events): this is what survives an unbounded stream.
    */
  def sessionize(events: DataFrame, gapUs: Long = 1800000000L): Dataset[SessionUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), col("ts_us").as("us"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionUpdate](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (userId, rows, state: GroupState[SessionState]) =>
          val sorted = rows.map(_._2).toSeq.sorted
          var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
          for (us <- sorted) {
            val newSession = st.lastUs == Long.MinValue || us - st.lastUs > gapUs
            st = SessionState(us, st.sessions + (if (newSession) 1 else 0), st.events + 1)
          }
          state.update(st)
          Iterator.single(SessionUpdate(userId, st.sessions, st.events))
      }
  }

  // ---- custom stateful operator: streaming exact dedup ----

  final case class DedupState(keeper: Long)
  final case class DedupVerdict(doc_id: Long, fp: String, keeper: Long, keep: Long)

  /** documents schema (the corpus landing zone). */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("text", StringType)))

  def documentStream(spark: SparkSession, inputDir: String): DataFrame =
    spark.readStream.schema(documentsSchema).parquet(inputDir)

  /** Enriched arrival schema: documents whose upstream embedding
    * service already attached the vector — the input shape of the
    * full-stack ingest tick (the ANN-encode member needs it).
    */
  val enrichedDocumentsSchema: StructType = StructType(
    documentsSchema.fields :+
      StructField("embedding", ArrayType(FloatType)))

  def enrichedDocumentStream(spark: SparkSession, inputDir: String): DataFrame =
    spark.readStream.schema(enrichedDocumentsSchema).parquet(inputDir)

  /** embeddings schema (the vector landing zone — arriving query
    * vectors for the knn label-transfer driver). */
  val embeddingsSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  def vectorStream(spark: SparkSession, inputDir: String): DataFrame =
    spark.readStream.schema(embeddingsSchema).parquet(inputDir)

  /** Streaming exact dedup for corpus ingest: state is ONE keeper id per
    * content fingerprint (md5 of normalized text), so memory is
    * O(distinct documents) — the streaming twin of the batch
    * [[graft.operators.DedupOps.dedupExact]]. Semantics are
    * first-arrival-wins (a stream cannot retract an already-emitted
    * keeper): the first batch that introduces a fingerprint elects the
    * smallest doc_id in that batch; every later duplicate arrives with
    * keep=0. When all data lands in one AvailableNow batch this equals
    * the batch operator's min-id-keeper exactly.
    */
  final case class ThrottleState(lastUs: Long)
  final case class ThrottleVerdict(event_id: Long, user_id: Long,
      event_type: String, ts_us: Long, gap_us: Long)

  /** Streaming event debounce — the stateful twin of the batch
    * [[graft.operators.Events.qEventDebounce]]: suppress an event when
    * the SAME (user, type) fired within `minGapUs` of the previous
    * occurrence. State is ONE last-seen timestamp per entity, so
    * memory is O(active entities), not O(events) — the throttle an
    * ingest tier runs before analytics on an unbounded stream. The
    * state advances on every SEEN event (kept or dropped), matching
    * the batch operator's lag-over-raw-events rule exactly, so
    * stream ≡ batch holds whenever arrivals respect per-entity time
    * order across micro-batches (the landing-zone contract;
    * StreamingSpec proves parity over ordered arrivals).
    */
  def streamingDebounce(events: DataFrame,
      minGapUs: Long = graft.operators.Events.DebounceMinGapUs): Dataset[ThrottleVerdict] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), col("event_type"), col("event_id"), col("ts_us"))
      .as[(Long, String, Long, Long)]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[ThrottleState, ThrottleVerdict](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case ((user, typ), rows, state: GroupState[ThrottleState]) =>
          val sorted = rows.toSeq.sortBy(e => (e._4, e._3))
          var last = state.getOption.map(_.lastUs).getOrElse(Long.MinValue)
          val out = sorted.flatMap { e =>
            val first = last == Long.MinValue
            val gap = if (first) -1L else e._4 - last
            val keep = first || gap > minGapUs
            last = e._4
            if (keep) Some(ThrottleVerdict(e._3, user, typ, e._4, gap)) else None
          }
          state.update(ThrottleState(last))
          out.iterator
      }
  }

  final case class QuotaState(tokBefore: Long)
  final case class QuotaVerdict(doc_id: Long, source: String, n_tokens: Long,
      tok_before: Long, admitted: Long)

  /** Streaming per-source ingestion quota — the stateful twin of
    * [[graft.operators.CurateOps.curateSourceQuota]]: state is ONE
    * running token total per source (O(sources) on an unbounded
    * stream); each micro-batch's rows for a source are processed in
    * doc_id order, so over doc_id-ordered arrivals the admissions
    * equal the batch operator exactly.
    */
  def streamingSourceQuota(docs: DataFrame, quota: Long = 1000L): Dataset[QuotaVerdict] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id"), col("source"),
        size(split(graft.operators.TextOps.normalized(col("text")), " "))
          .cast("long").as("n_tokens"))
      .as[(Long, String, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[QuotaState, QuotaVerdict](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (source, rows, state: GroupState[QuotaState]) =>
          var before = state.getOption.map(_.tokBefore).getOrElse(0L)
          val out = rows.toSeq.sortBy(_._1).map { r =>
            val v = QuotaVerdict(r._1, source, r._3, before,
              if (before < quota) 1L else 0L)
            before += r._3
            v
          }
          state.update(QuotaState(before))
          out.iterator
      }
  }

  def runSourceQuota(
      newDocs: DataFrame,
      store: RelationStore,
      table: String,
      checkpointDir: String,
      quota: Long = 1000L): Unit = {
    val q = streamingSourceQuota(newDocs, quota).toDF().writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        landAppend(store, table, batch, batchId)
      }
      .start()
    q.awaitTermination()
  }

  def streamingExactDedup(docs: DataFrame): Dataset[DedupVerdict] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id"),
        md5(graft.operators.TextOps.normalized(col("text"))).as("fp"))
      .as[(Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[DedupState, DedupVerdict](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (fp, rows, state: GroupState[DedupState]) =>
          val ids = rows.map(_._1).toSeq.sorted
          val keeper = state.getOption.map(_.keeper).getOrElse(ids.min)
          state.update(DedupState(keeper))
          ids.iterator.map(id =>
            DedupVerdict(id, fp, keeper, if (id == keeper) 1L else 0L))
      }
  }

  /** Drive streaming dedup over available data, appending verdicts. */
  def runExactDedup(
      docs: DataFrame,
      store: RelationStore,
      table: String,
      checkpointDir: String): Unit = {
    val q = streamingExactDedup(docs).toDF().writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        landAppend(store, table, batch, batchId)
      }
      .start()
    q.awaitTermination()
  }

  /** Score a stream of arriving documents under a PRE-TRAINED DSIR
    * importance model (graft.operators.CurateOps.dsirModel) — the
    * stream-static pattern shared with [[runIncrementalDedup]]: the
    * model tables are bounded artifacts (64 weights + 1 normalizer)
    * broadcast into each micro-batch's scoring plan, which is the
    * EXACT batch plan (CurateOps.dsirScore), so stream ≡ batch holds
    * by construction. Per-batch cost is O(batch); the model is never
    * retrained in the hot path — the shape continuous corpus
    * admission runs at ingest time.
    */
  /** Shared scaffold for the frozen-model micro-batch scorers:
    * Append + AvailableNow + foreachBatch applying `transform` (the
    * batch plan verbatim) and appending the result to `table`. Every
    * run* driver is this plus its transform, so a change to the
    * append/write semantics (restart dedup, write mode) lands ONCE.
    */
  /** Land an append micro-batch into a store table as an immutable
    * per-batchId delta directory ([[RelationStore.appendDelta]]). ONE
    * definition — the scorer scaffold, the ingest tick, and the quota
    * driver all land through it, so a change to landing semantics has
    * exactly one home. Two properties the 100 TB ingest loop needs:
    *
    *  - O(batch) bytes per tick (never a rewrite of the landed table —
    *    cumulative I/O is linear in data ingested, with a periodic
    *    hard-link fold that moves metadata, not data);
    *  - replay idempotence: foreachBatch is at-least-once, and a
    *    replayed epoch finds its batchId already committed and lands
    *    nothing — `df` is lazy, so the skipped transform isn't even
    *    computed, and landed-state consumers (quota totals) stay exact.
    */
  private[streaming] def landAppend(store: RelationStore, table: String,
      df: DataFrame, batchId: Long): Unit = {
    store.appendDelta(df, table, batchId)
    ()
  }

  private def runAppendScorer(
      newDocs: DataFrame,
      store: RelationStore,
      table: String,
      checkpointDir: String)(transform: DataFrame => DataFrame): Unit = {
    val q = newDocs.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        landAppend(store, table, transform(batch), batchId)
      }
      .start()
    q.awaitTermination()
  }

  def runDsirScore(
      newDocs: DataFrame,
      wtab: DataFrame,
      norm: DataFrame,
      store: RelationStore,
      table: String,
      checkpointDir: String): Unit = {
    runAppendScorer(newDocs, store, table, checkpointDir) { batch =>
      graft.operators.CurateOps.dsirScore(batch, wtab, norm)
    }
  }

  /** Bucket a stream of arriving documents under a FROZEN CCNet model
    * (the char-LM bits table + the two tercile thresholds trained by
    * the batch pass — exactly what [[graft.operators.TextOps.txtCcnetBuckets]]
    * computes once and a production pipeline persists): per micro-batch
    * the scoring plan is the batch plan verbatim
    * (TextOps.charLmScoreWith + ccnetBucketWith), so stream ≡ batch
    * holds by construction. The model is alphabet-bounded (≤ 37² rows
    * + 2 longs) — broadcast into every batch, never retrained in the
    * hot path.
    */
  def runCcnetBuckets(
      newDocs: DataFrame,
      model: DataFrame,
      t1: Long,
      t2: Long,
      store: RelationStore,
      table: String,
      checkpointDir: String): Unit = {
    runAppendScorer(newDocs, store, table, checkpointDir) { batch =>
      graft.operators.TextOps.ccnetBucketWith(
          graft.operators.TextOps.charLmScoreWith(batch, model)
            .select(col("doc_id"), col("avg_millibits")), t1, t2)
    }
  }

  /** Route arriving documents to their nearest probe exemplar by
    * sparse TF-IDF cosine under a FROZEN retrieval model (the idf
    * table + probe unit vectors the batch pass trains —
    * graft.operators.TextOps.tfidfIdf / tfidfUnitVecs): per
    * micro-batch the scoring plan is the batch plan verbatim
    * (TextOps.tfidfRouteWith), so stream ≡ batch holds by
    * construction. Both model tables are bounded (vocabulary /
    * 10 probes × their shingles) — broadcast into every batch, never
    * retrained in the hot path. The content-routing shape a streaming
    * ingest uses to tag documents with a topic anchor at arrival.
    */
  def runTfidfRoute(
      newDocs: DataFrame,
      idf: DataFrame,
      probes: DataFrame,
      store: RelationStore,
      table: String,
      checkpointDir: String): Unit = {
    runAppendScorer(newDocs, store, table, checkpointDir) { batch =>
      graft.operators.TextOps.tfidfRouteWith(batch, idf, probes)
    }
  }

  /** Apply the Gopher quality gate to arriving documents — every rule
    * signal is PER-DOCUMENT ([[graft.operators.CurateOps.gopherGateOf]]
    * is the batch plan verbatim over each micro-batch's tokens), so
    * stream ≡ batch holds by construction with no model artifact at
    * all: the thresholds are the operator's fixed rule set. The
    * quality-admission shape a continuous ingest pipeline runs before
    * anything corpus-relative (dedup, budgets) sees the document.
    */
  def runGopherGate(
      newDocs: DataFrame,
      store: RelationStore,
      table: String,
      checkpointDir: String): Unit = {
    runAppendScorer(newDocs, store, table, checkpointDir) { batch =>
      graft.operators.CurateOps.gopherGateOf(
          batch.select(col("doc_id"),
            split(graft.operators.TextOps.normalized(col("text")), " ").as("w")))
    }
  }

  /** Tag arriving documents with their dominant lexicon topic — the
    * subject-stratification step at ingest. The lexicon is a fixed
    * literal ([[graft.operators.TextOps.TopicLexicon]]) and every
    * signal is per-document, so stream ≡ batch holds by construction
    * with no trained artifact at all; per micro-batch the plan is
    * [[graft.operators.TextOps.topicTagWith]] verbatim.
    */
  def runTopicTag(
      newDocs: DataFrame,
      store: RelationStore,
      table: String,
      checkpointDir: String): Unit =
    runAppendScorer(newDocs, store, table, checkpointDir) { batch =>
      graft.operators.TextOps.topicTagWith(batch.sparkSession, batch)
    }

  /** Strip corpus-trained boilerplate from arriving documents: the
    * strike set ([[graft.operators.TextOps.boilerplateHashes]], frozen
    * from the existing corpus) is a static broadcast table and each
    * micro-batch runs [[graft.operators.TextOps.boilerplateFilterWith]]
    * — the batch plan verbatim, so stream ≡ batch holds by
    * construction (every document arrives whole, so its per-doc
    * reassembly is complete within its own micro-batch). Per-batch
    * cost is O(batch): the corpus is touched only at model-training
    * time, the same frozen-model discipline as the DSIR/CCNet/TF-IDF
    * streaming scorers.
    */
  def runBoilerplateFilter(
      newDocs: DataFrame,
      boiler: DataFrame,
      store: RelationStore,
      table: String,
      checkpointDir: String): Unit = {
    runAppendScorer(newDocs, store, table, checkpointDir) { batch =>
      graft.operators.TextOps.boilerplateFilterWith(batch, boiler)
    }
  }

  /** Parquet stream of arriving embedding rows (vec_id, embedding,
    * label) — the ANN ingest source.
    */
  def embeddingStream(spark: SparkSession, inputDir: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vec_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("embedding",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.types.StructField("label", org.apache.spark.sql.types.IntegerType)))
    spark.readStream.schema(schema).parquet(inputDir)
  }

  /** IVF index maintenance over a stream of arriving vectors: each
    * micro-batch cell-assigns against the FROZEN persisted centroid
    * table via the exact batch plan
    * ([[graft.operators.SimilarityOps.ivfAssignWith]]) and appends the
    * assignments — continuous ANN ingest with NO retraining in the hot
    * path (the production IVF pattern: rebuild centroids offline,
    * assign online). Per-batch cost is O(batch)·nCentroids; stream ≡
    * batch by construction (StreamingSpec proves it).
    */
  def runIvfAssign(
      newVectors: DataFrame,
      centroids: DataFrame,
      store: RelationStore,
      table: String,
      checkpointDir: String): Unit = {
    runAppendScorer(newVectors, store, table, checkpointDir) { batch =>
      graft.operators.SimilarityOps.ivfAssignWith(batch, centroids)
    }
  }

  /** The composed INGEST TICK — the production shape where one stream
    * pass runs the whole document-admission stack per micro-batch:
    * per-source quota admission against the landed running totals,
    * near-dup probe against the frozen dedup index, Gopher rule gate,
    * per-language CCNet bucketing under the frozen char-LM + threshold
    * artifacts, topic tagging, boilerplate strike filtering under the
    * frozen strike set, CDC shared-span probing against the frozen
    * chunk index, missed-duplicate edge mining against the frozen
    * rare-shingle postings index, and IVF-PQ encoding of the arriving
    * embeddings under the frozen centroids + codebook — TWELVE tables
    * from ONE readStream: ten verdict/audit tables plus the
    * quota-admitted CORPUS itself (the batch is cached once and feeds
    * every plan, so arriving data is scanned once, not twelve times).
    * Every member is the exact batch operator, so each table is
    * stream ≡ batch by construction and the composition adds no new
    * semantics — only the single-pass execution a 100 TB ingest loop
    * actually wants.
    *
    * Input: [[enrichedDocumentStream]] arrivals (documents + an
    * `embedding` column the upstream embedding service attached).
    * Quota state is ZERO extra bookkeeping: each tick derives the
    * per-source running totals from the already-landed quota table
    * (sources-bounded aggregate), so a restarted tick resumes exactly
    * where the landed data says it is.
    *
    * FROZEN-ARTIFACT CONTRACT: every reference-side DataFrame here
    * (`charLm`, `langThresholds`, `boiler`, `centroids`, `codebook`,
    * `cdcRef`, `edgeRef`, `spanGrams`) must be a PERSISTED/static
    * table — a parquet read of a written artifact, the pattern the
    * specs follow. The tick re-evaluates each plan per micro-batch, so
    * a live plan over the corpus would re-derive the reference every
    * tick (O(corpus) per tick instead of O(batch)) and could drift
    * mid-stream if the corpus moves. The contract is EXECUTABLE: with
    * `spark.graft.ingest.validateFrozen=true` each reference plan must
    * analyze to a bare relation scan (projections/filters over a
    * file/local relation) or the tick fails fast naming the offender —
    * see [[requireFrozen]].
    */
  def runIngestTick(
      newDocs: DataFrame,
      index: graft.operators.DedupOps.DedupIndex,
      charLm: DataFrame,
      langThresholds: DataFrame,
      boiler: DataFrame,
      centroids: DataFrame,
      codebook: DataFrame,
      cdcRef: DataFrame,
      edgeRef: DataFrame,
      spanGrams: DataFrame,
      store: RelationStore,
      prefix: String,
      checkpointDir: String,
      quota: Long = 1000L): Unit = {
    if (newDocs.sparkSession.conf
        .getOption("spark.graft.ingest.validateFrozen").contains("true"))
      Seq("charLm" -> charLm, "langThresholds" -> langThresholds,
        "boiler" -> boiler, "centroids" -> centroids, "codebook" -> codebook,
        "cdcRef" -> cdcRef, "edgeRef" -> edgeRef, "spanGrams" -> spanGrams)
        .foreach { case (n, df) => requireFrozen(n, df) }
    val q = newDocs.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch0: DataFrame, batchId: Long) =>
        val batch = batch0.cache()
        try {
          // admission FIRST: totals derive from the landed table, so
          // within a tick the quota verdict must land before anything
          // else could observe it (ordering is per-table, not global).
          // Replay safety: prevTotals must be computed from the landed
          // state BEFORE this batchId — if the quota verdict for this
          // epoch already landed (crash-replay), recomputing totals
          // would double-count the batch, so landAppend's batchId skip
          // keeps the already-landed (correct) verdict and the garbage
          // recompute is never evaluated (DataFrames are lazy).
          val quotaTbl = s"${prefix}_quota"
          // store.read pins its delta-path list at CONSTRUCTION, so
          // prevTotals sees exactly the pre-tick landed state no matter
          // when the plan evaluates within this tick
          val prevTotals =
            if (store.exists(quotaTbl))
              store.read(quotaTbl).groupBy(col("source"))
                .agg(sum(col("n_tokens")).as("tok_prev"))
            else batch.select(col("source")).where(lit(false))
              .withColumn("tok_prev", lit(0L))
          val verdict =
            if (store.batchLanded(quotaTbl, batchId))
              // crash-replay of a partially-landed epoch: this epoch's
              // verdicts are already durable — recomputing them against
              // totals that now INCLUDE the epoch would flip admissions,
              // so downstream members reuse the landed rows instead
              store.read(quotaTbl).join(batch.select(col("doc_id")), Seq("doc_id"))
            else graft.operators.CurateOps.sourceQuotaWith(batch, prevTotals, quota)
          landAppend(store, quotaTbl, verdict, batchId)
          // the admitted CORPUS itself — the eighth table that makes the
          // tick a complete ingest: quota-admitted documents land with
          // their full enriched columns, everything else is audit trail
          landAppend(store, s"${prefix}_corpus",
            batch.join(verdict.filter(col("admitted") === 1L).select(col("doc_id")),
              Seq("doc_id"), "left_semi"),
            batchId)
          landAppend(store, s"${prefix}_dedup",
            graft.operators.DedupOps.probeAgainstIndex(batch, index), batchId)
          landAppend(store, s"${prefix}_gopher",
            graft.operators.CurateOps.gopherGateOf(
              batch.select(col("doc_id"),
                split(graft.operators.TextOps.normalized(col("text")), " ").as("w"))),
            batchId)
          landAppend(store, s"${prefix}_ccnet",
            graft.operators.TextOps.ccnetLangBucketWith(
              graft.operators.TextOps.charLmScoreWith(batch, charLm)
                .select(col("doc_id"), col("avg_millibits"))
                .join(batch.select(col("doc_id"), col("lang")), Seq("doc_id")),
              langThresholds),
            batchId)
          landAppend(store, s"${prefix}_topics",
            graft.operators.TextOps.topicTagWith(batch.sparkSession, batch), batchId)
          landAppend(store, s"${prefix}_boiler",
            graft.operators.TextOps.boilerplateFilterWith(batch, boiler), batchId)
          landAppend(store, s"${prefix}_mojibake",
            graft.operators.TextOps.mojibakeOf(batch), batchId)
          landAppend(store, s"${prefix}_cdc",
            graft.operators.DedupOps.cdcProbeWith(batch, cdcRef), batchId)
          landAppend(store, s"${prefix}_edges",
            graft.operators.DedupOps.edgeProbeWith(batch, edgeRef), batchId)
          landAppend(store, s"${prefix}_codes",
            graft.operators.SimilarityOps.ivfPqEncodeWith(
              batch.select(col("doc_id").as("vec_id"), col("embedding")),
              centroids, codebook),
            batchId)
          // clean-on-ingest span removal: arriving docs drop every span
          // the frozen corpus already owns (keeper = reference side by
          // definition) — the twelfth table, and the one that rewrites
          // content rather than scoring it
          landAppend(store, s"${prefix}_cleaned",
            graft.operators.DedupOps.spanRemoveWith(
              batch.select(col("doc_id"), col("text")), spanGrams),
            batchId)
        } finally batch.unpersist()
      }
      .start()
    q.awaitTermination()
  }

  /** The executable half of the ingest tick's frozen-artifact contract:
    * a reference DataFrame must analyze to a BARE relation scan —
    * projections/filters/aliases over a file or local relation — never
    * a plan with joins/aggregates that would re-derive the artifact per
    * micro-batch (O(corpus) per tick) and drift mid-stream. Enabled via
    * `spark.graft.ingest.validateFrozen=true` (debug mode; the check
    * walks analyzed plans, so it costs an analysis pass per reference).
    */
  private[graft] def requireFrozen(name: String, df: DataFrame): Unit = {
    import org.apache.spark.sql.catalyst.plans.logical._
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    // a UNION of bare scans is frozen too: a store.read() of a
    // delta-landed artifact is (manifest scan ∪ delta dirs) under a
    // column-order Project. A cache()d computed plan is DELIBERATELY
    // rejected: eviction re-derives it mid-stream — exactly the drift
    // the contract exists to prevent; persist the artifact instead.
    def bare(p: LogicalPlan): Boolean = p match {
      case _: LogicalRelation | _: LocalRelation => true
      case pr: Project => bare(pr.child)
      case f: Filter => bare(f.child)
      case a: SubqueryAlias => bare(a.child)
      case u: Union => u.children.forall(bare)
      case _ => false
    }
    val plan = df.queryExecution.analyzed
    if (!bare(plan))
      throw new IllegalArgumentException(
        s"ingest tick reference '$name' violates the frozen-artifact contract: " +
          s"its plan is not a bare relation scan and would re-derive per tick " +
          s"(persist the artifact and read it back).\n${plan.treeString}")
  }

  /** Multimodal dedup ingest: each micro-batch of arriving payloads
    * probes the FROZEN bucketed phash index via the exact batch plan
    * ([[graft.operators.Multimodal.mmProbeAgainstIndex]]) — per-doc
    * verdicts join only the batch against the index, so stream ≡ batch
    * by construction and only the O(batch) probe side shuffles.
    */
  def runMmDedup(
      newDocs: DataFrame,
      indexChunks: DataFrame,
      store: RelationStore,
      table: String,
      checkpointDir: String): Unit = {
    runAppendScorer(newDocs, store, table, checkpointDir) { batch =>
      graft.operators.Multimodal.mmProbeAgainstIndex(batch, indexChunks)
    }
  }

  /** Streaming near-duplicate PAIR mining at wide hamming radius — the
    * incremental face of the multi-index chunk join
    * ([[graft.operators.DedupOps.hammingPairs]]) rather than a probe
    * against a frozen index: each micro-batch of arriving payloads
    * computes its phash signatures, emits (a) pairs WITHIN the batch
    * via the exact batch operator and (b) pairs against every
    * PREVIOUSLY LANDED signature via the across-join
    * ([[graft.operators.DedupOps.hammingPairsAcross]] — O(batch ·
    * bucket) per tick, the landed set never re-joins itself), then
    * lands its own signatures for later ticks. Stream ≡ batch exactly:
    * within + across over ANY arrival split partitions the full pair
    * set — an unordered pair lands once, in the tick its later member
    * arrives. Landing order is pairs THEN signatures, so a replayed
    * epoch (crash between the two appends) recomputes pairs against
    * the same pre-batch landed set and the batchId dedup skips
    * whichever append already committed. The index arm (pair vs triple
    * keys) follows the landed-corpus size, exactly as the batch
    * operator's `nRows` hint would at that scale.
    */
  def runMmPairs(
      newDocs: DataFrame,
      store: RelationStore,
      sigTable: String,
      pairTable: String,
      checkpointDir: String,
      maxHamming: Int = 8): Unit = {
    import graft.operators.{DedupOps, Multimodal}
    val q = newDocs.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val sigsB = Multimodal.mmPhashOf(batch)
          .select(col("doc_id"), col("phash")).cache()
        try {
          val nB = sigsB.count()
          val (seen, nSeen) =
            if (store.exists(sigTable)) {
              val t = store.read(sigTable); (Some(t), t.count())
            } else (None, 0L)
          val nRows = Some(nSeen + nB)
          val within = DedupOps.hammingPairs(sigsB, "phash", maxHamming, nRows)
          val across = seen.map { sg =>
            DedupOps.hammingPairsAcross(sigsB, sg, "phash", maxHamming, nRows)
              .select(least(col("doc_new"), col("doc_ref")).as("doc_a"),
                greatest(col("doc_new"), col("doc_ref")).as("doc_b"),
                col("hamming"))
          }
          val pairs = across.fold(within)(within.unionByName(_))
          landAppend(store, pairTable, pairs, batchId)
          landAppend(store, sigTable, sigsB, batchId)
        } finally sigsB.unpersist()
      }
      .start()
    q.awaitTermination()
  }

  /** Streaming knn label transfer: each micro-batch of arriving
    * vectors is classified against a FROZEN labeled reference table
    * (persisted parquet, like every frozen index here) through the
    * EXACT batch core ([[graft.operators.SimilarityOps
    * .knnClassifyCore]]) — the bounded `knn_topk` hash aggregate, the
    * rectangular block tiling, never a rank window — so stream ≡ batch
    * holds by construction (each query's top-k depends only on the
    * query and the frozen reference). Per-tick cost O(batch ·
    * reference / blocks) scored rows, the same shape the batch
    * operator pays per test vector.
    */
  def runKnnClassify(
      newVectors: DataFrame,
      refVectors: DataFrame,
      store: RelationStore,
      table: String,
      checkpointDir: String,
      k: Int = 5,
      nBlocks: Int = 8): Unit = {
    import graft.operators.SimilarityOps
    val train = SimilarityOps.quantizedOf(refVectors)
    val lbl = refVectors.select(col("vec_id"), col("label").cast("long").as("label"))
    runAppendScorer(newVectors, store, table, checkpointDir) { batch =>
      SimilarityOps.knnClassifyCore(
        SimilarityOps.quantizedOf(batch), train, lbl, k, nBlocks)
    }
  }

  /** Streaming char-entropy gate: the per-doc distribution entropy is
    * row-local (no corpus model), so each micro-batch scores under the
    * EXACT batch plan ([[graft.operators.TextOps.charEntropyOf]]) —
    * stream ≡ batch by construction, per-batch cost O(batch chars).
    */
  def runCharEntropy(
      newDocs: DataFrame,
      store: RelationStore,
      table: String,
      checkpointDir: String): Unit =
    runAppendScorer(newDocs, store, table, checkpointDir)(
      graft.operators.TextOps.charEntropyOf)

  /** Streaming mojibake gate: the row-local encoding-artifact plan
    * ([[graft.operators.TextOps.mojibakeOf]]) IS the batch plan, so
    * stream ≡ batch by construction — the ingest-side guard that stops
    * a double-encoded source the tick it appears instead of after the
    * nightly sweep.
    */
  def runMojibake(
      newDocs: DataFrame,
      store: RelationStore,
      table: String,
      checkpointDir: String): Unit =
    runAppendScorer(newDocs, store, table, checkpointDir)(
      graft.operators.TextOps.mojibakeOf)

  /** Streaming C4 line-level gate: the row-local page-structure plan
    * ([[graft.operators.TextOps.c4GateOf]]) IS the batch plan — each
    * arriving page gets its Raffel §2.2 verdict the tick it lands.
    */
  def runC4Gate(
      newDocs: DataFrame,
      store: RelationStore,
      table: String,
      checkpointDir: String): Unit =
    runAppendScorer(newDocs, store, table, checkpointDir)(
      graft.operators.TextOps.c4GateOf)

  /** Streaming eval-set decontamination: every arriving document is
    * gated against a STATIC eval-suite 8-gram set
    * ([[graft.operators.CurateOps.decontaminateOf]]) the tick it
    * lands — contamination never enters the corpus instead of being
    * swept out later. The verdict depends only on the document and the
    * fixed eval side, so the union over micro-batches equals the batch
    * sweep. Build `evalGrams` ONCE via
    * [[graft.operators.CurateOps.evalGramsOf]] (suite-bounded, AQE
    * broadcasts it under every tick's join).
    */
  def runDecontaminate(
      newDocs: DataFrame,
      evalGrams: DataFrame,
      store: RelationStore,
      table: String,
      checkpointDir: String): Unit =
    runAppendScorer(newDocs, store, table, checkpointDir)(
      b => graft.operators.CurateOps.decontaminateOf(b, evalGrams))

  /** Streaming UniMax mixing monitor: each micro-batch sum-merges its
    * per-language token counts into a persisted BOUNDED language grid
    * (O(languages) state — never per-document), then re-derives the
    * water-fill allocation from the grid via the exact batch rule
    * ([[graft.operators.CurateOps.unimaxOf]]). Because the grid after
    * all arrivals equals the batch aggregate, stream ≡ batch by
    * construction — a language crossing its capacity mid-stream
    * re-allocates every other language's share on the next tick. The
    * grid merge is NOT replay-idempotent, so the commit carries the
    * foreachBatch batchId ([[RelationStore.write]] batchTag) and a
    * replayed epoch skips the merge; the allocation table is a pure
    * function of the grid and rewrites unconditionally.
    */
  def runUnimaxMix(
      newDocs: DataFrame,
      store: RelationStore,
      gridTable: String,
      allocTable: String,
      checkpointDir: String,
      budget: Long = 30000L,
      epochCap: Long = 2L): Unit = {
    val q = newDocs.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!store.lastBatchTag(gridTable).exists(_ >= batchId)) {
          val delta = batch.select(col("lang"),
            size(split(graft.operators.TextOps.normalized(col("text")), " "))
              .cast("long").as("n_tokens"))
            .groupBy(col("lang")).agg(sum(col("n_tokens")).as("tok_lang"))
          val merged =
            if (store.exists(gridTable))
              store.read(gridTable).unionByName(delta)
                .groupBy(col("lang")).agg(sum(col("tok_lang")).as("tok_lang"))
            else delta
          store.write(merged, gridTable, batchTag = Some(batchId))
        }
        store.write(
          graft.operators.CurateOps.unimaxOf(store.read(gridTable), budget, epochCap),
          allocTable)
      }
      .start()
    q.awaitTermination()
  }

  /** Streaming volume-anomaly monitor: each micro-batch sum-merges its
    * (event_type, day) counts into the persisted BOUNDED day grid
    * (metadata-scale state — types × days, never per-event), then
    * re-derives the spike table from the grid via the exact batch rule
    * ([[graft.operators.Events.anomalyOf]]). Because the grid after
    * all arrivals equals the batch grid, stream ≡ batch by
    * construction — including retroactive un-spiking when a late
    * partial day fills in.
    */
  def runEventAnomaly(
      newEvents: DataFrame,
      store: RelationStore,
      gridTable: String,
      anomalyTable: String,
      checkpointDir: String): Unit = {
    val q = newEvents.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // sum-merging is NOT replay-idempotent — a replayed epoch would
        // double-count its events into the grid. The grid commit carries
        // the batchId (atomic with the data), so a replay skips the
        // merge; the anomaly table is a pure function of the grid and is
        // rewritten unconditionally (idempotent overwrite) so a crash
        // between the two writes still converges on replay.
        if (!store.lastBatchTag(gridTable).exists(_ >= batchId)) {
          val delta = graft.operators.Events.dailyCounts(batch)
          val merged =
            if (store.exists(gridTable))
              store.read(gridTable).unionByName(delta)
                .groupBy(col("day"), col("event_type")).agg(sum(col("n")).as("n"))
            else delta
          store.write(merged, gridTable, batchTag = Some(batchId))
        }
        store.write(graft.operators.Events.anomalyOf(store.read(gridTable)), anomalyTable)
      }
      .start()
    q.awaitTermination()
  }

  /** Bucket a stream of arriving documents under the FROZEN per-LANG
    * CCNet model (char-LM bits table + the per-language tercile
    * threshold table trained by the batch pass) — the scoring and
    * assignment are the exact batch plans, so stream ≡ batch.
    */
  def runCcnetLangBuckets(
      newDocs: DataFrame,
      model: DataFrame,
      thr: DataFrame,
      store: RelationStore,
      table: String,
      checkpointDir: String): Unit = {
    runAppendScorer(newDocs, store, table, checkpointDir) { batch =>
      graft.operators.TextOps.ccnetLangBucketWith(
        graft.operators.TextOps.charLmScoreWith(batch, model)
          .select(col("doc_id"), col("avg_millibits"))
          .join(batch.select(col("doc_id"), col("lang")), Seq("doc_id")),
        thr)
    }
  }

  /** Score a stream of arriving documents under a FROZEN word-trigram
    * stupid-backoff model (the three count tables + total trained by
    * [[graft.operators.TextOps.trigramModel]]) via the exact batch
    * scoring plan ([[graft.operators.TextOps.trigramScoreWith]]) —
    * stream ≡ batch by construction; unseen words hit the OOV floor.
    */
  def runTrigramLmScore(
      newDocs: DataFrame,
      tri: DataFrame,
      bi: DataFrame,
      uni: DataFrame,
      total: DataFrame,
      store: RelationStore,
      table: String,
      checkpointDir: String): Unit = {
    runAppendScorer(newDocs, store, table, checkpointDir) { batch =>
      graft.operators.TextOps.trigramScoreWith(batch, tri, bi, uni, total)
    }
  }

  /** IVF-PQ ingest over a stream of arriving vectors: each micro-batch
    * cell-assigns AND PQ-encodes against the FROZEN persisted centroids
    * + codebook via the exact batch plan
    * ([[graft.operators.SimilarityOps.ivfPqEncodeWith]]), appending
    * (vec_id, cell, m, c) code rows — the codes, not the vectors, are
    * what the serving layout stores. Stream ≡ batch by construction.
    */
  def runIvfPqEncode(
      newVectors: DataFrame,
      centroids: DataFrame,
      codebook: DataFrame,
      store: RelationStore,
      table: String,
      checkpointDir: String): Unit = {
    runAppendScorer(newVectors, store, table, checkpointDir) { batch =>
      graft.operators.SimilarityOps.ivfPqEncodeWith(batch, centroids, codebook)
    }
  }

  /** ANN serving over a stream of arriving QUERY vectors: each
    * micro-batch answers its probes against the FROZEN persisted
    * IVF-PQ index via the exact batch query plan
    * ([[graft.operators.SimilarityOps.ivfPqQueryWith]]) — per batch
    * the probed cell literals prune the code scan to nProbe
    * directories. Per-probe results are batch-independent, so
    * stream ≡ batch by construction.
    */
  def runIvfPqQuery(
      probeVectors: DataFrame,
      indexPath: String,
      store: RelationStore,
      table: String,
      checkpointDir: String): Unit = {
    runAppendScorer(probeVectors, store, table, checkpointDir) { batch =>
      graft.operators.SimilarityOps.ivfPqQueryWith(batch.sparkSession, batch, indexPath)
    }
  }

  /** Drive incremental (batch-vs-index) dedup over a stream of newly
    * arriving documents: each micro-batch probes a PREBUILT static
    * index via the exact same [[graft.operators.DedupOps.probeAgainstIndex]]
    * plan the batch operator uses — the stream-static join pattern, so
    * stream ≡ batch holds by construction (StreamingSpec proves it).
    * The index DataFrames are static: at scale they are the persisted
    * index tables, re-read per micro-batch, never recomputed from the
    * corpus — per-batch cost stays O(batch), the property that makes
    * continuous ingest dedup viable at 100 TB corpus size.
    */
  def runIncrementalDedup(
      newDocs: DataFrame,
      index: graft.operators.DedupOps.DedupIndex,
      store: RelationStore,
      table: String,
      checkpointDir: String): Unit = {
    runAppendScorer(newDocs, store, table, checkpointDir) { batch =>
      graft.operators.DedupOps.probeAgainstIndex(batch, index)
    }
  }

  /** CDC shared-span probe over a stream of arriving documents against
    * a frozen chunk index ([[graft.operators.DedupOps.cdcProbeWith]]):
    * per-doc verbatim-overlap verdicts at O(batch) per tick via the
    * same stream-static join pattern as [[runIncrementalDedup]] —
    * chunking is the codegen'd `cdc_chunks` expression, the index is a
    * persisted table re-read per micro-batch, never recomputed.
    */
  def runCdcProbe(
      newDocs: DataFrame,
      refChunks: DataFrame,
      store: RelationStore,
      table: String,
      checkpointDir: String): Unit = {
    runAppendScorer(newDocs, store, table, checkpointDir) { batch =>
      graft.operators.DedupOps.cdcProbeWith(batch, refChunks)
    }
  }

  /** Missed-duplicate edge mining over arriving documents against a
    * frozen rare-shingle postings index
    * ([[graft.operators.DedupOps.edgeProbeWith]]): each micro-batch
    * lands its (doc_new, doc_ref, n_rare) topical-overlap edges at
    * O(batch · maxDf) via the stream-static join pattern — the
    * incremental maintenance path for the link-prediction/modularity
    * graph family. `refPostings` must be a PERSISTED/static table
    * (parquet read), like every frozen index here.
    */
  def runEdgeProbe(
      newDocs: DataFrame,
      refPostings: DataFrame,
      store: RelationStore,
      table: String,
      checkpointDir: String): Unit = {
    runAppendScorer(newDocs, store, table, checkpointDir) { batch =>
      graft.operators.DedupOps.edgeProbeWith(batch, refPostings)
    }
  }

  /** Verbatim-span provenance over arriving documents against a frozen
    * POSITIONAL gram index ([[graft.operators.DedupOps.spanProbeWith]]):
    * each micro-batch lands its (doc_new, doc_ref, longest span)
    * report via the stream-static join pattern. `refPostings` must be
    * a persisted/static table, like every frozen index here.
    */
  def runSpanProbe(
      newDocs: DataFrame,
      refPostings: DataFrame,
      store: RelationStore,
      table: String,
      checkpointDir: String): Unit = {
    runAppendScorer(newDocs, store, table, checkpointDir) { batch =>
      graft.operators.DedupOps.spanProbeWith(batch, refPostings)
    }
  }

  /** Scored IVF assignment of arriving vectors against FROZEN centroids
    * — the landing half of the index-drift monitor
    * ([[graft.operators.SimilarityOps.simIndexDrift]]'s aggregates then
    * derive from the landed per-vector (cell, cos_ppm) table plus the
    * index's training-side aggregates, both bounded).
    */
  def runDriftAssign(
      newVectors: DataFrame,
      centroids: DataFrame,
      store: RelationStore,
      table: String,
      checkpointDir: String): Unit = {
    runAppendScorer(newVectors, store, table, checkpointDir) { batch =>
      graft.operators.SimilarityOps.driftAssignWith(batch, centroids)
    }
  }

  /** RAKE keyword tagging over arriving documents: the score is
    * entirely DOC-LOCAL (phrase runs, word deg/freq, top-3 all within
    * one document), so the streaming gate IS the batch plan per
    * micro-batch — no frozen artifact, no cross-batch state.
    */
  def runRake(
      newDocs: DataFrame,
      store: RelationStore,
      table: String,
      checkpointDir: String): Unit = {
    runAppendScorer(newDocs, store, table, checkpointDir) { batch =>
      graft.operators.TextOps.rakeOf(batch)
    }
  }

  /** Watermarked stream-stream interval join: every purchase matched to
    * the same user's clicks in the preceding hour (last-touch
    * attribution). BOTH sides carry watermarks and the join condition
    * bounds event time in BOTH directions, so Spark can evict join
    * state as watermarks advance — without the interval + watermark
    * pair a stream-stream join buffers its inputs forever, which is the
    * classic unbounded-state failure at production scale.
    */
  def clickPurchaseJoin(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts_t").as("click_ts"))
      .withWatermark("click_ts", "2 hours")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts_t").as("purchase_ts"), col("value"))
      .withWatermark("purchase_ts", "2 hours")
    purchases.join(clicks,
        col("user_id") === col("c_user") &&
          col("click_ts") <= col("purchase_ts") &&
          col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("user_id"), col("purchase_id"), col("click_id"),
        round(col("value") * 100).cast("long").as("value_cents"))
  }

  /** Streaming dedup on event_id bounded by the watermark:
    * `dropDuplicatesWithinWatermark` keeps per-key state only until the
    * watermark passes the key's event time — the streaming analogue of
    * the batch exact-dedup operator with O(watermark-window) state
    * instead of O(stream history). Duplicates arriving later than the
    * delay are the deliberate trade (at 100 TB/day, unbounded exact
    * state is not an option; route late data to the batch dedup).
    */
  def dedupWithinWatermark(events: DataFrame, delay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts_t", delay)
      .dropDuplicatesWithinWatermark("event_id")
      .select(col("event_id"), col("user_id"), col("event_type"))

  /** Stream-static enrichment: the event stream joined to a bounded
    * static dimension (user tiers) via broadcast — no stream state at
    * all, the static side re-reads per micro-batch. This is the
    * workhorse production shape (enrich a firehose against reference
    * data); at scale the only constraint is that the dim broadcasts,
    * which is the same bound the batch engine's dimension joins obey.
    */
  def enrichWithDim(events: DataFrame, userDim: DataFrame): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(userDim), Seq("user_id"))
      .groupBy(col("tier"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("sum_value_cents"))

  /** Drive sessionization over available data, landing results in the
    * store (complete per-user rows each trigger → merge on user_id).
    */
  def runSessionize(
      events: DataFrame,
      store: RelationStore,
      table: String,
      checkpointDir: String): Unit = {
    val q = sessionize(events).toDF().writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (store.exists(table)) {
          val target = store.read(table)
          val kept = target.join(batch.select("user_id").distinct(), Seq("user_id"), "left_anti")
          store.write(kept.unionByName(batch), table)
        } else store.write(batch, table)
      }
      .start()
    q.awaitTermination()
  }
}
