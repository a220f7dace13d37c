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
}
