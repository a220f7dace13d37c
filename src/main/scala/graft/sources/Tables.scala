package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated parquet test tables (TESTDATA.md).
  *
  * All reads go through `spark.read.parquet` so Catalyst handles column
  * pruning + predicate pushdown into the scan. At cluster scale the same
  * API reads a partitioned table directory; nothing here assumes local mode.
  *
  * `events.ts` has shipped as parquet TIMESTAMP(NANOS) (scanned as a raw
  * long under `spark.sql.legacy.parquet.nanosAsLong=true`) and as
  * TIMESTAMP(MICROS) (scanned as TIMESTAMP_NTZ). [[normalizeEventTs]]
  * derives the same two columns from either physical type: `ts_us`
  * (integer microseconds — integer arithmetic throughout; doubles cannot
  * represent epoch-nanos > 2^53 exactly) and a session-TZ timestamp
  * `ts_t`. The session timezone is pinned to UTC (GraftSession), so the
  * NTZ→instant reading matches DuckDB's naive-epoch interpretation and
  * the oracle's `epoch_ns(ts) // 1000` is identical for every source
  * precision.
  */
object Tables {
  /** Add `ts_us` (µs since epoch, long) + `ts_t` (timestamp) derived
    * from whatever physical type the `ts` column scanned as. Works on
    * batch and streaming DataFrames (stateless projections only).
    */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    val tsUs: Column = df.schema("ts").dataType match {
      case LongType => expr("ts div 1000") // legacy nanos-as-long
      case TimestampNTZType => unix_micros(col("ts").cast(TimestampType))
      case TimestampType => unix_micros(col("ts"))
      case t => throw new IllegalArgumentException(s"unsupported events.ts type: $t")
    }
    df.withColumn("ts_us", tsUs)
      .withColumn("ts_t", timestamp_micros(col("ts_us")))
  }

  val tpch: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val extra: Seq[String] = Seq("events", "documents", "embeddings")
  val all: Seq[String] = tpch ++ extra

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeEventTs(df) else df
  }

  /** Source rows per fanout task: 8 k docs × 30–300× explode ≈ 0.25–2 M
    * exploded rows per task — a healthy task size for the gram/shingle/
    * char pipelines. Rows, not bytes: columnar compression makes file
    * size a ~10×-off proxy for the per-row work the fanout multiplies.
    */
  private val RowsPerFanoutTask = 8192L

  /** Memoized per (dir, table) fanout decision — the row count (one
    * metadata-cheap parquet count) and scan-partition probe run once
    * per JVM per source, not once per query invocation.
    */
  private val fanoutTarget =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  /** [[load]] + guaranteed scan parallelism for FANOUT consumers. The
    * explode-heavy pipelines (shingles, grams, per-char streams,
    * per-dimension vector ops) multiply the row count 30–300×, so a
    * source that scans as fewer partitions than its SIZE warrants — a
    * single parquet row group: one fat crawl file — pins the ENTIRE
    * fanout pipeline to one task (the sf1 scaling probe measured the
    * signature stage of the payload simhash at 30 s single-task for
    * this reason, BENCH_SCALE.md). One cheap pre-fanout round-robin
    * shuffle of the RAW rows (corpus bytes, not exploded bytes)
    * restores parallelism.
    *
    * SIZE-AWARE, not unconditional: the target is one task per
    * [[RowsPerFanoutTask]] source rows (capped at session
    * parallelism), so a corpus small enough for one task keeps its
    * zero-shuffle single-task plan — an unconditional spread measured
    * +0.2–1.8 s per query across the sf0.1 bench (tiny corpus, pure
    * exchange + planning overhead) — and any real multi-file table is
    * already wider than the target: a no-op with zero added shuffle.
    */
  def loadFanout(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = load(spark, dir, name)
    val target: Int = fanoutTarget.computeIfAbsent(s"$dir/$name", _ => {
      val rows = df.count()
      val t = math.min(spark.sparkContext.defaultParallelism.toLong,
        (rows + RowsPerFanoutTask - 1) / RowsPerFanoutTask).toInt
      if (t > 1 && df.rdd.getNumPartitions < t) t else 1
    })
    if (target > 1) df.repartition(target) else df
  }

  /** Register every table as a temp view named after itself (for spark.sql paths). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
