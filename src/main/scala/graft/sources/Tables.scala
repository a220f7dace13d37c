package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet test tables (TESTDATA.md).
  *
  * All reads go through `spark.read.parquet` so Catalyst handles column
  * pruning + predicate pushdown into the scan. At cluster scale the same
  * API reads a partitioned table directory; nothing here assumes local mode.
  *
  * `events.ts` is parquet TIMESTAMP(NANOS); with
  * `spark.sql.legacy.parquet.nanosAsLong=true` it scans as a long. We
  * expose `ts_us` (microseconds, integer division — doubles would corrupt
  * epoch-nanos > 2^53) plus a proper timestamp column `ts_t`.
  */
object Tables {
  val tpch: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val extra: Seq[String] = Seq("events", "documents", "embeddings")
  val all: Seq[String] = tpch ++ extra

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.withColumn("ts_us", expr("ts div 1000"))
        .withColumn("ts_t", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** Register every table as a temp view named after itself (for spark.sql paths). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
