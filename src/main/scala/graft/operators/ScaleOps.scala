package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Skew-resilience utilities (SURVEY.md §"Optimize for scale":
  * "skewed keys → salting or AQE skew-join").
  *
  * AQE's skew-join split handles joins; aggregation hot keys are the
  * other classic skew shape — one group holding 30% of a 100 TB table
  * funnels through a single reducer. [[saltedAgg]] is the standard
  * two-phase fix: pre-aggregate on (key, salt) so every hot key fans
  * out over `buckets` reducers, then combine the partials. Counts and
  * sums are exact under any salting (associative + commutative), so
  * the result is oracle-identical to the direct groupBy.
  */
object ScaleOps {
  /** Two-phase salted count+sum aggregation. The salt derives from the
    * partition id — zero extra hashing, stable within a task, and the
    * partial fan-out matches the actual data distribution.
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      sumCol: Column,
      buckets: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id(), lit(buckets)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__n"), sum(sumCol).as("__s"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("sum_value_cents"))
  }

  /** Oracle-checked demonstration: salted two-phase aggregation over
    * events produces exactly the direct GROUP BY result.
    */
  def qSkewSaltedAgg(s: SparkSession, dir: String): DataFrame =
    saltedAgg(
      Tables.load(s, dir, "events"),
      Seq("event_type"),
      Relational.cents(col("value")))
      .select(col("event_type"), col("n"),
        col("sum_value_cents").cast("long").as("sum_value_cents"))

  /** Global heavy hitters WITHOUT a groupBy(item) shuffle: the
    * Misra–Gries sketch ([[graft.functions.FreqSketch]]) aggregates
    * map-side into <=k-entry buffers, so the exchange carries one tiny
    * sketch per partition no matter the item cardinality. Emits the
    * sketch rows next to exact counts (computed here at test scale);
    * OpsSpec bounds the estimates. Rows-only driver check — the
    * surviving counter SET below the guarantee threshold is
    * partitioning-dependent by design.
    */
  def qHeavyUsers(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "events")
    val sk = e.agg(graft.functions.FreqSketch.freqSketch(col("user_id"), 32).as("sk"))
      .select(explode(col("sk")).as("x"))
      .select(col("x.item").as("user_id"), col("x.est").as("est"))
    val exact = e.groupBy(col("user_id")).agg(count(lit(1)).as("n_true"))
    sk.join(exact, Seq("user_id"))
  }

  /** Salted join for skewed keys: replicate the dimension side `buckets`
    * times (explode over the salt domain) and salt the fact side from
    * its partition id, so one hot key spreads over `buckets` reducers
    * instead of funnelling through one. Exact — every fact row still
    * matches its dimension row exactly once (on (key, salt)).
    *
    * This is the MANUAL fix for join skew; AQE's runtime skew split
    * (`spark.sql.adaptive.skewJoin`) handles the same shape
    * transparently when partition-size stats reveal it. The salted form
    * matters when the skew is known ahead of time (a null-heavy foreign
    * key, a celebrity user) or the join is sort-merge with a skewed
    * build side AQE can't split.
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      buckets: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("__salt", pmod(spark_partition_id(), lit(buckets)))
    val repDim = dim.withColumn("__salt", explode(array((0 until buckets).map(lit): _*)))
    saltedFact.join(repDim, Seq(key, "__salt")).drop("__salt")
  }

  /** Oracle-checked demonstration: per-event-type totals joined through
    * a salted key join equal the plain join's result. event_type is a
    * genuinely hot key (5 distinct values over the whole events table —
    * an unsalted shuffle join would use at most 5 reducers).
    */
  def qSkewSaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val events = Tables.load(s, dir, "events")
    // exact integer mean test (cents * n > sum) — a float AVG could
    // flip boundary rows between engines
    val typeDim = events.groupBy(col("event_type"))
      .agg(sum(Relational.cents(col("value"))).as("type_sum_cents"),
        count(lit(1)).as("type_n"))
    saltedJoin(events, typeDim, "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum((Relational.cents(col("value")) * col("type_n") > col("type_sum_cents"))
          .cast("long")).as("n_above_avg"))
      .select(col("event_type"), col("n"), col("n_above_avg"))
  }
}
