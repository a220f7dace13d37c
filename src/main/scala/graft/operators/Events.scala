package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Event-stream operators over the `events` table.
  *
  * These are the batch formulations of the engine's incremental /
  * snapshot / microbatch semantics (SURVEY.md §2.1, §2.7): each one is a
  * deterministic query, so the same logic that the materialization layer
  * runs against a live table is verified here against the DuckDB oracle.
  *
  * All timestamp arithmetic is integer microseconds (`ts div 1000` from
  * the raw nanos long — see [[graft.sources.Tables]]); never doubles.
  */
object Events {
  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  /** Microbatch-style daily tumbling-window aggregate: one shuffle on
    * (day, event_type); at scale the day column is the partition key the
    * incremental writer would `replaceWhere` on.
    */
  def qEventsDaily(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .groupBy(
        date_format(col("ts_t"), "yyyy-MM-dd").as("day"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(Relational.cents(col("value"))).as("sum_value_cents"),
        countDistinct(col("user_id")).as("n_users"))

  /** Sessionization: a new session starts after a 30-minute silence gap.
    * Single shuffle on user_id; window functions run within partitions.
    */
  def qSessionize(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    ev(s, dir)
      .select(col("user_id"), col("event_id"), col("ts_us"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > 1800000000L, 1L).otherwise(0L))
      .groupBy(col("user_id"))
      .agg(sum(col("new_session")).as("n_sessions"), count(lit(1)).as("n_events"))
  }

  /** Incremental-merge semantics: latest row per key (argmax by event
    * time). This is exactly what the `incremental/merge` materialization
    * computes for its source batch before MERGE.
    */
  def qMergeLatest(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us").desc, col("event_id").desc)
    ev(s, dir)
      .select(col("user_id"), col("event_type"), col("ts_us"), col("event_id"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("last_type"), col("ts_us").as("last_us"))
  }

  /** SCD-2 snapshot semantics (timestamp strategy): collapse the event
    * log to state-change rows with [valid_from, valid_to) intervals;
    * valid_to is NULL for the current row. Mirrors the snapshot
    * materialization's check logic as a pure query.
    */
  def qScd2(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val changes = ev(s, dir)
      .select(col("user_id"), col("event_type"), col("ts_us"), col("event_id"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNull || col("event_type") =!= col("prev_type"))
    val w2 = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    changes
      .withColumn("valid_to_us", lead(col("ts_us"), 1).over(w2))
      .select(col("user_id"), col("event_type").as("state"),
        col("ts_us").as("valid_from_us"), col("valid_to_us"))
  }

  /** As-of join — an operator Spark lacks natively (DuckDB/kdb have it;
    * the oracle uses DuckDB's ASOF LEFT JOIN): each 'click' event picks
    * up the most recent 'purchase' AT OR BEFORE it for the same user.
    *
    * Implementation is the scalable union-and-scan formulation, NOT a
    * per-row probe or range cross-join: tag both streams, sort each
    * user's timeline once (a single shuffle on user_id), and carry the
    * last reference timestamp forward with `last(_, ignoreNulls)` over
    * an unbounded-preceding window. O(n log n) per user partition, one
    * shuffle total, no broadcast of either stream — the plan a 100 TB
    * event log needs. Reference rows sort before probes at equal
    * timestamps (tag 0 < 1) giving ASOF's inclusive `>=` semantics.
    */
  def qAsofJoin(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir)
    val refs = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us").as("us"), lit(0).as("tag"),
        lit(null).cast("long").as("event_id"))
    val probes = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us").as("us"), lit(1).as("tag"), col("event_id"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("tag"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    refs.unionByName(probes)
      .withColumn("purchase_us", last(when(col("tag") === 0, col("us")), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("user_id"), col("event_id"), col("us"), col("purchase_us"),
        (col("us") - col("purchase_us")).as("lag_us"))
  }

  /** Forward as-of join — the other direction kdb/DuckDB expose: each
    * 'click' picks up the EARLIEST 'purchase' at or after it for the
    * same user (attribution "time to next conversion"). Same
    * union-and-scan shape as [[qAsofJoin]], mirrored: the window scans
    * [current row, unbounded following] and takes the FIRST reference
    * timestamp. Probes sort before refs at equal timestamps (tag
    * 0 < 1) so an equal-time purchase is inside the window — the
    * inclusive `<=` ASOF semantics. Still one user_id shuffle, no
    * broadcast, no per-row probe.
    */
  def qAsofForward(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir)
    val refs = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us").as("us"), lit(1).as("tag"),
        lit(null).cast("long").as("event_id"))
    val probes = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us").as("us"), lit(0).as("tag"), col("event_id"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("tag"), col("event_id"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    refs.unionByName(probes)
      .withColumn("purchase_us", first(when(col("tag") === 1, col("us")), ignoreNulls = true).over(w))
      .filter(col("tag") === 0)
      .select(col("user_id"), col("event_id"), col("us"), col("purchase_us"),
        (col("purchase_us") - col("us")).as("lead_us"))
  }

  /** Range (interval) join — 'view' events followed by a 'click' from
    * the same user within one hour. The naive plan is a cross join
    * with an inequality filter (quadratic per user); this is the
    * bucketed formulation: both sides key by floor(us / 60s), the click
    * side also emits its predecessor bucket, and a pair within the
    * window must land on exactly one shared key — so the join is a pure
    * equi-join with bounded per-key fanout, followed by the exact range
    * filter. Standard interval-join shape (Flink's interval join does
    * the same internally); survives any corpus size.
    */
  def qRangeJoin(s: SparkSession, dir: String): DataFrame = {
    val windowUs = 3600000000L // 1 h
    val e = ev(s, dir)
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts_us").as("view_us"))
      // integer `div`, not floor(x/y): double division rounds epoch-us
      // quotients at bucket boundaries
      .withColumn("bk", expr(s"view_us div ${windowUs}L"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts_us").as("click_us"))
      // a matching view is in this bucket or the previous one; emitting
      // {bk-1, bk} makes every qualifying pair match on EXACTLY one key
      // (no post-join dedup needed)
      .withColumn("bk", explode(expr(s"array(click_us div ${windowUs}L - 1, click_us div ${windowUs}L)")))
    views.join(clicks, Seq("user_id", "bk"))
      .filter(col("click_us") >= col("view_us") &&
        col("click_us") - col("view_us") <= windowUs &&
        col("click_id") =!= col("view_id"))
      .select(col("user_id"), col("view_id"), col("click_id"),
        (col("click_us") - col("view_us")).as("delta_us"))
  }

  /** The same interval join written NAIVELY (pure inequality, no
    * manual bucketing) and fixed by the automatic range-join rewrite
    * (plans/RangeJoinRewrite, enabled here via its bin-size conf): the
    * optimizer turns the would-be BroadcastNestedLoopJoin into the
    * bucketed equi-join that [[qRangeJoin]] builds by hand. Aggregated
    * so the oracle compare is compact; RangeJoinRuleSpec proves the
    * row-level rewrite equality and plan shape.
    *
    * The bin-size conf arms the rewrite for EVERY inequality join in
    * the session, so it is scoped to a child `newSession()` here: same
    * SparkContext, caches, and injected extensions, but its own
    * SQLConf. The conf must be live at EXECUTION time (DataFrames are
    * lazy — a set/restore around construction would be undone before
    * the optimizer ever runs), and the caller's session must stay
    * untouched: a 1-hour bin constant silently applied to a future
    * unrelated inequality join over non-time longs would explode
    * fanout. RangeJoinRuleSpec pins both properties.
    */
  def qRangeJoinAuto(s: SparkSession, dir: String): DataFrame = {
    val scoped = s.newSession()
    scoped.conf.set(graft.plans.RangeJoinRewrite.BinConf, "3600000000") // 1 h bins
    val e = ev(scoped, dir)
    val views = e.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("ts_us").as("view_us"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("ts_us").as("click_us"))
    clicks.join(views,
        col("view_us") <= col("click_us") &&
          col("click_us") - col("view_us") <= 3600000000L)
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("click_id")).as("n_clicks"),
        countDistinct(col("view_id")).as("n_views"),
        sum(col("click_us") - col("view_us")).as("sum_delta_us"))
  }

  /** Ordered conversion funnel (view → click → purchase): per user,
    * the first view, the first click strictly after it, the first
    * purchase strictly after that — then one global roll-up row.
    * Every stage is a groupBy/join on user_id, so all three shuffles
    * share one key (at scale: co-partitioned, and each stage's input
    * is already the much smaller per-user table after stage one).
    */
  def qFunnel(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir).select(col("user_id"), col("event_type"), col("ts_us"))
    val views = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("t_view"))
    val clicks = e.filter(col("event_type") === "click")
      .join(views, Seq("user_id"))
      .filter(col("ts_us") > col("t_view"))
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("t_click"))
    val buys = e.filter(col("event_type") === "purchase")
      .join(clicks, Seq("user_id"))
      .filter(col("ts_us") > col("t_click"))
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("t_buy"), first(col("t_click")).as("t_click"))
    // global aggregates (no grouping) so an empty stage still yields
    // the one roll-up row with zero counts, matching the oracle's
    // scalar subqueries; the cross joins multiply three 1-row inputs
    views.agg(count(lit(1)).as("n_view_users"))
      .crossJoin(clicks.agg(count(lit(1)).as("n_click_users")))
      .crossJoin(buys.agg(count(lit(1)).as("n_buy_users"),
        coalesce(sum(col("t_buy") - col("t_click")), lit(0L)).as("sum_buy_lag_us")))
  }

  /** RANGE-frame moving aggregate: per user, the count and cent-sum of
    * their events in the trailing 24 hours of VALUE range (not row
    * count — ties and gaps behave per SQL RANGE semantics). One shuffle
    * on user_id; the frame arithmetic is integer microseconds so the
    * oracle hashes exactly.
    */
  def qRollingWindow(s: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      .rangeBetween(-dayUs, 0L)
    ev(s, dir)
      .select(col("user_id"), col("event_id"), col("ts_us"),
        Relational.cents(col("value")).as("cents"))
      .select(col("user_id"), col("event_id"),
        count(lit(1)).over(w).as("n_24h"),
        sum(col("cents")).over(w).as("cents_24h"))
  }

  /** Cohort retention matrix: users bucketed by first-seen week, then
    * distinct active users per (cohort_week, weeks_since) cell — the
    * standard product-analytics retention triangle. Two shuffles, both
    * on bounded keys: first-seen is a groupBy(user) min; the cell
    * aggregate joins it back (co-keyed on user_id, then aggregates on
    * the tiny (cohort, offset) key space). Weeks are integer epoch-us
    * arithmetic so the oracle hashes exactly.
    */
  def qCohortRetention(s: SparkSession, dir: String): DataFrame = {
    val weekUs = 7L * 86400000000L
    val e = ev(s, dir).select(col("user_id"), col("ts_us"))
      .withColumn("week", expr(s"ts_us div ${weekUs}L"))
    val firstSeen = e.groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
    e.join(firstSeen, Seq("user_id"))
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("weeks_since"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  /** Event-transition mining (first-order path analysis): per user,
    * consecutive event-type pairs in time order, counted globally —
    * the Markov transition table behind "what do users do after X".
    * One shuffle on user_id for the lead() window, then a partial-
    * aggregated count on the tiny (from, to) key space. Ties on ts are
    * broken by event_id so the sequence is total and deterministic.
    */
  def qEventTransitions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    ev(s, dir).select(col("user_id"), col("event_id"), col("ts_us"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** JSON extraction (the `props` column) + aggregation. */
  def qEventsJson(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .select(col("event_type"), get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))

  /** Behavioral-sequence assembly (structured logs → LM training
    * sequences, the interaction-data analogue of document chunking):
    * each (user, 30-min session) becomes one training sample whose
    * text is the time-ordered event-type token string. Session
    * boundaries are [[qSessionize]]'s gap rule; the session index is
    * the running sum of boundary flags.
    *
    * Scale shape: the boundary window and the running sum share ONE
    * user-keyed sort (same partitioning, no second exchange); assembly
    * is a (user, session)-keyed aggregate whose state is bounded by
    * session length — the same doc-bounded discipline as
    * [[graft.operators.TextOps.txtBoilerplateRemove]]'s reassembly.
    */
  def qSessionText(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    ev(s, dir)
      .select(col("user_id"), col("event_id"), col("ts_us"), col("event_type"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > 1800000000L, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("new_session")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        array_join(expr("transform(array_sort(collect_list(struct(ts_us, event_id, event_type))), x -> x.event_type)"),
          " ").as("session_text"))
  }

  /** Event debounce (telemetry repeat suppression): drop an event when
    * the SAME (user, type) fired within the last 5 minutes — the
    * throttle rule ingestion applies before events reach analytics.
    * Keeps the first of each burst; emits the kept events with their
    * gap to the previous occurrence (−1 = first ever).
    *
    * Scale shape: one (user, type)-keyed sort window with a single
    * `lag`; partitions are per-entity-bounded (the [[qSessionize]]
    * contract), and the filter is row-parallel after the window.
    */
  /** Shared throttle window (5 min in µs) — the batch operator, the
    * streaming twin, and the oracle SQL all read this ONE value, so a
    * tuning change cannot silently break stream ≡ batch parity.
    */
  val DebounceMinGapUs: Long = 300000000L

  def qEventDebounce(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts_us"), col("event_id"))
    ev(s, dir)
      .select(col("user_id"), col("event_type"), col("event_id"), col("ts_us"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
      .withColumn("gap_us", coalesce(col("ts_us") - col("prev_us"), lit(-1L)))
      .filter(col("prev_us").isNull || col("gap_us") > DebounceMinGapUs)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts_us"), col("gap_us"))
  }

  /** Daily event-volume anomaly detection: flag a (event_type, day)
    * whose count exceeds 2× its trailing-7-day daily mean — the
    * telemetry-pipeline monitor that catches an instrumentation bug or
    * incident spike before it contaminates downstream aggregates. The
    * spike rule is exact integer arithmetic (7·n > 2·Σ_prev7), only
    * evaluated where the full 7-day history exists.
    *
    * Scale: the corpus collapses FIRST to the (type, day) count grid
    * (map-side combined — types × days, metadata-scale at any event
    * volume); the trailing window then partitions over that bounded
    * grid, never over raw events.
    */
  def qEventAnomaly(s: SparkSession, dir: String): DataFrame =
    anomalyOf(dailyCounts(ev(s, dir)))

  /** The bounded (event_type, day) count grid — the persisted state a
    * streaming monitor maintains incrementally
    * ([[graft.streaming.Streaming.runEventAnomaly]] sum-merges each
    * micro-batch's counts into it).
    */
  def dailyCounts(events: DataFrame): DataFrame =
    events
      .groupBy(date_format(col("ts_t"), "yyyy-MM-dd").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"))

  /** Spike detection over an (event_type, day, n) grid — shared by the
    * batch operator and the streaming monitor, so stream ≡ batch is by
    * construction once the grids agree. The window runs over the
    * bounded day grid, never raw events — and it is a RANGE frame on
    * the integer day number, not a rows frame: zero-event days are
    * simply absent from the grid, so a rows(-7,-1) frame would stretch
    * across calendar gaps and compare today against a month-old
    * baseline while still claiming "7 days of history". The range
    * frame sees exactly the last 7 CALENDAR days; the full-history
    * gate (prev7_days = 7) then genuinely means all of them had
    * events.
    */
  def anomalyOf(daily: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("day_num"))
      .rangeBetween(-7, -1)
    daily
      .withColumn("day_num", datediff(to_date(col("day")), to_date(lit("1970-01-01"))).cast("long"))
      .withColumn("prev7_sum", sum(col("n")).over(w))
      .withColumn("prev7_days", count(col("n")).over(w))
      .select(col("event_type"), col("day"), col("n"),
        coalesce(col("prev7_sum"), lit(0L)).as("prev7_sum"),
        col("prev7_days"),
        when(col("prev7_days") === 7L && col("n") * 7L > col("prev7_sum") * 2L, 1L)
          .otherwise(0L).as("is_spike"))
  }

  /** Marketing attribution: for each purchase, its LAST-TOUCH view
    * (the latest preceding `view` by the same user within a 7-day
    * window) plus the touch count the linear model would split
    * revenue across — with the split done in exact integer cents
    * (each touch gets cents div n, the last touch absorbs the
    * remainder, so attributed revenue sums to revenue EXACTLY — a
    * float split leaks cents at reconciliation).
    *
    * Scale: one user-keyed equi-join between the purchase and view
    * event streams with the window predicate applied on the join
    * output (per-user fan-in bounded by user activity; for heavy
    * users the banded range-join rewrite in plans/RangeJoinRewrite
    * applies); the per-purchase argmax is max(struct) — no window
    * over raw events.
    */
  def qAttribution(s: SparkSession, dir: String): DataFrame = {
    val windowUs = 7L * 86400000000L
    val e = ev(s, dir)
    val buys = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts_us").as("t_buy"), Relational.cents(col("value")).as("cents"))
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts_us").as("t_view"))
    val touches = buys.join(views, Seq("user_id"))
      .filter(col("t_view") <= col("t_buy") &&
        col("t_buy") - col("t_view") <= windowUs)
    val attributed = touches.groupBy(col("user_id"), col("purchase_id"),
        col("t_buy"), col("cents"))
      .agg(count(lit(1)).as("n_touch"),
        max(struct(col("t_view"), col("view_id"))).as("b"))
      .select(col("user_id"), col("purchase_id"), col("cents"), col("n_touch"),
        col("b.view_id").as("last_touch_id"),
        (col("t_buy") - col("b.t_view")).as("last_touch_gap_us"),
        expr("cents div n_touch").as("linear_cents_per_touch"),
        // the last touch absorbs the integer remainder: per-touch
        // shares sum back to cents exactly
        (expr("cents div n_touch") + col("cents") % col("n_touch")).as("last_touch_cents"))
    buys.join(attributed,
        Seq("user_id", "purchase_id", "cents"), "left")
      .select(col("user_id"), col("purchase_id"), col("cents"),
        coalesce(col("n_touch"), lit(0L)).as("n_touch"),
        coalesce(col("last_touch_id"), lit(-1L)).as("last_touch_id"),
        coalesce(col("last_touch_gap_us"), lit(-1L)).as("last_touch_gap_us"),
        coalesce(col("linear_cents_per_touch"), lit(0L)).as("linear_cents_per_touch"),
        coalesce(col("last_touch_cents"), lit(0L)).as("last_touch_cents"))
  }

  /** RFM user segmentation with an integer time-decayed activity
    * score — the classic marketing/engagement triage (recency,
    * frequency, monetary) over the event log:
    *
    *   - recency_days   = days since the user's last event, against
    *                      the corpus max timestamp (integer µs → days)
    *   - frequency      = event count
    *   - monetary_cents = Σ round(value·100) (exact integer cents)
    *   - decay_cents    = Σ value_cents >> (age_days/30) — activity
    *                      halving every 30 days as an exact integer
    *                      SHIFT, not a float exp() (bit-replayable)
    *
    * Scores use fixed industry bands (not corpus quantiles) so the
    * whole plan is ONE user-keyed aggregate + row-parallel banding —
    * no corpus-wide window, no ordering; at 100 TB this is a single
    * map-side-combined shuffle on user_id. The corpus max ts is a
    * 1-row broadcast.
    */
  def qRfmSegments(s: SparkSession, dir: String): DataFrame = {
    val maxTs = ev(s, dir).agg(max(col("ts_us")).as("corpus_max_us"))
    val perUser = ev(s, dir)
      .crossJoin(broadcast(maxTs))
      .select(col("user_id"),
        expr("(corpus_max_us - ts_us) div 86400000000").as("age_days"),
        Relational.cents(col("value")).as("cents"))
      .groupBy(col("user_id"))
      .agg(min(col("age_days")).as("recency_days"),
        count(lit(1)).as("frequency"),
        sum(col("cents")).as("monetary_cents"),
        sum(expr("shiftright(cents, cast(least(age_days div 30, 62) as int))")).as("decay_cents"))
    perUser.select(col("user_id"), col("recency_days"), col("frequency"),
        col("monetary_cents"), col("decay_cents"),
        when(col("recency_days") <= 7, 5L).when(col("recency_days") <= 30, 4L)
          .when(col("recency_days") <= 90, 3L).when(col("recency_days") <= 180, 2L)
          .otherwise(1L).as("r_score"),
        when(col("frequency") >= 50, 5L).when(col("frequency") >= 20, 4L)
          .when(col("frequency") >= 10, 3L).when(col("frequency") >= 5, 2L)
          .otherwise(1L).as("f_score"),
        when(col("monetary_cents") >= 500000L, 5L).when(col("monetary_cents") >= 100000L, 4L)
          .when(col("monetary_cents") >= 20000L, 3L).when(col("monetary_cents") >= 5000L, 2L)
          .otherwise(1L).as("m_score"))
      .withColumn("segment",
        when(col("r_score") >= 4 && col("f_score") >= 4, "champion")
          .when(col("r_score") >= 4 && col("f_score") >= 2, "loyal")
          .when(col("r_score") >= 3, "active")
          .when(col("f_score") >= 4, "at_risk")
          .otherwise("hibernating"))
  }
}
