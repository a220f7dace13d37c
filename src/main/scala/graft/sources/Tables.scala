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
    * exploded rows per task — a healthy task size for the token-level
    * shingle/char pipelines. Rows, not bytes: columnar compression makes
    * file size a ~10×-off proxy for the per-row work the fanout
    * multiplies.
    */
  private val RowsPerFanoutTask = 8192L

  /** Fanout weight for BYTE-gram consumers (the payload-simhash
    * kernel): ~n_bytes ≈ 1–2 k hash computations per source row, an
    * order of magnitude above the token pipelines, so the per-task row
    * budget shrinks accordingly (512 docs × ~1–2 k grams ≈ 0.5–1 M
    * digests per task). Without this weight the row-count threshold
    * keeps a 5 k-doc corpus single-task while it runs millions of
    * digests (the sf0.1 bench measured the signature stage at ~3.2 s
    * pinned to one core).
    */
  private[graft] val RowsPerGramFanoutTask = 512L

  /** Memoized fanout decision / row count, keyed by the source's
    * CONCRETE FILE LISTING (not its path): a table rewritten in place
    * (ScaleGen regenerating a scratch dir, OPTIMIZE compacting a
    * store) produces new part-file names, so the rewrite gets a fresh
    * probe instead of a stale target that would silently drop the
    * parallelism guard or add a useless shuffle. The probe itself runs
    * OUTSIDE any map lock (plain get / putIfAbsent — losers of a rare
    * duplicate race discard an identical deterministic value), so a
    * slow count can never block concurrent loads of other sources
    * hashing to the same bin.
    */
  private val fanoutTarget =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  private val rowCounts =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Memo key = path + hash of the sorted file listing (driver-side
    * metadata, no Spark job). */
  private def listingKey(df: DataFrame, dir: String, name: String): String =
    s"$dir/$name#${java.util.Arrays.hashCode(df.inputFiles.sorted.asInstanceOf[Array[AnyRef]])}"

  /** Concrete-listing fingerprint of a source table — the same
    * staleness key the fanout/row-count memos use, for operator-side
    * memos (e.g. the hot-shingle probe) that must re-derive when a
    * table is rewritten in place.
    */
  private[graft] def listingFingerprint(spark: SparkSession, dir: String,
      name: String): String = listingKey(load(spark, dir, name), dir, name)

  /** Row count of a source table, memoized per concrete file listing
    * (one metadata-cheap parquet count per listing per JVM). */
  def rowCount(spark: SparkSession, dir: String, name: String): Long = {
    val df = load(spark, dir, name)
    val key = listingKey(df, dir, name)
    val cached = rowCounts.get(key)
    if (cached != null) cached.longValue()
    else {
      val n = df.count()
      rowCounts.putIfAbsent(key, n)
      n
    }
  }

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
  def loadFanout(spark: SparkSession, dir: String, name: String,
      rowsPerTask: Long = RowsPerFanoutTask): DataFrame = {
    val df = load(spark, dir, name)
    val key = s"${listingKey(df, dir, name)}@$rowsPerTask"
    val cached = fanoutTarget.get(key)
    val target: Int =
      if (cached != null) cached.intValue()
      else {
        val rows = rowCount(spark, dir, name)
        val t0 = math.min(spark.sparkContext.defaultParallelism.toLong,
          (rows + rowsPerTask - 1) / rowsPerTask).toInt
        val t = if (t0 > 1 && df.rdd.getNumPartitions < t0) t0 else 1
        fanoutTarget.putIfAbsent(key, t)
        t
      }
    if (target > 1) df.repartition(target) else df
  }

  /** Register every table as a temp view named after itself (for spark.sql paths). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
