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

  /** JSON extraction (the `props` column) + aggregation. */
  def qEventsJson(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .select(col("event_type"), get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
}
