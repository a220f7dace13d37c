package graft.tools

import java.time.{LocalDateTime, ZoneOffset}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Deterministic synthetic-corpus generator for the SCALING PROBE.
  *
  * The driver-generated test data (TESTDATA.md) stops at sf0.1
  * (~600 k lineitem rows) — every larger-scale claim in this repo is a
  * design argument (plan pins, bounded-fanout reasoning, opened-file
  * counts). This generator reproduces the SAME schemas, per-sf row-count
  * formulas, and value distributions as the driver corpus (measured from
  * `/root/testdata/sf0.1` — domains, category frequencies, fanouts,
  * near-dup rate, token vocabulary, unit-norm embeddings) at ANY scale
  * factor, so the full bench battery can be driven at 10× bench scale
  * and per-query wall-ratios published (`BENCH_SCALE.md`). It writes
  * only to the caller-given scratch dir — `/root/testdata` stays
  * untouched.
  *
  * Determinism is COUNTER-MODE, not sequence-mode: every draw for row
  * `i` of table `t` is a pure function of `(Seed, t, i, drawIndex)`
  * (SplitMix64 streams keyed by fmix64 of the coordinates), so the
  * output is identical under any partitioning, task order, or retry —
  * the property that makes "generate once per round, reuse across
  * sweeps" sound, and the same property a 1000-executor run would need
  * (a sequential java.util.Random handed across partitions would tie
  * the content to the task schedule). Generation itself is distributed:
  * `spark.range(n, parts)` + a typed per-row map, no driver-side loops.
  */
object ScaleGen {
  val Seed = 42L

  // ---- counter-mode RNG ----

  /** murmur3 fmix64 — full-avalanche 64-bit finalizer. */
  private def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33; x
  }

  private val Golden = 0x9e3779b97f4a7c15L // SplitMix64 gamma

  /** All draws for one (table-stream, row) coordinate. Each `next()` is
    * `fmix64(base + ctr*gamma)` — SplitMix64 in counter mode, seeded by
    * the avalanche-mixed coordinates.
    */
  final class RowRng(stream: Long, row: Long) {
    private val base = fmix64(Seed ^ fmix64(stream) ^ fmix64(row * Golden + 1))
    private var ctr = 0L
    def next(): Long = { ctr += 1; fmix64(base + ctr * Golden) }
    /** Uniform in [0, 1). */
    def uniform(): Double = (next() >>> 11).toDouble / (1L << 53).toDouble
    /** Uniform int in [0, bound). */
    def int(bound: Int): Int = (uniform() * bound).toInt
    /** Uniform long in [0, bound). */
    def long(bound: Long): Long = (uniform() * bound).toLong
    /** Standard normal (Box–Muller; consumes two draws). */
    def gaussian(): Double = {
      val u1 = math.max(uniform(), 1e-300); val u2 = uniform()
      math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
    }
  }

  private def round2(x: Double): Double = math.round(x * 100.0) / 100.0

  // distinct SplitMix64 stream tags per table (and per independent
  // concern within a table, so e.g. a doc's raw token stream is the
  // same whether or not the doc was chosen as a near-dup base)
  private val TagSupplier = 1L; private val TagCustomer = 2L
  private val TagPart = 3L; private val TagOrders = 4L
  private val TagLineitem = 5L; private val TagEvents = 6L
  private val TagDocText = 7L; private val TagDocMeta = 8L
  private val TagEmbeddings = 9L

  // ---- row-count formulas (TESTDATA.md scaling, measured at sf0.01/0.1) ----
  def nSupplier(sf: Double): Long = math.max(1L, (10000 * sf).round)
  def nCustomer(sf: Double): Long = math.max(1L, (150000 * sf).round)
  def nPart(sf: Double): Long = math.max(1L, (200000 * sf).round)
  def nOrders(sf: Double): Long = math.max(1L, (1500000 * sf).round)
  def nLineitem(sf: Double): Long = math.max(1L, (6000000 * sf).round)
  def nEvents(sf: Double): Long = math.max(1L, (1000000 * sf).round)
  def nUsers(sf: Double): Long = math.max(1L, (15000 * sf).round)
  // the driver floors the text/vector corpora at 500 rows (measured:
  // sf0.001 and sf0.01 both carry 500 docs + 500 vecs)
  def nDocuments(sf: Double): Long = math.max(500L, (50000 * sf).round)
  def nEmbeddings(sf: Double): Long = math.max(500L, (20000 * sf).round)

  private def parts(n: Long): Int =
    math.max(1L, math.min(32L, n / 100000L)).toInt

  // ---- row shapes (schemas match the driver parquet exactly) ----
  final case class Region(r_regionkey: Int, r_name: String)
  final case class Nation(n_nationkey: Int, n_name: String, n_regionkey: Int)
  final case class Supplier(s_suppkey: Long, s_name: String, s_nationkey: Int,
      s_acctbal: Double)
  final case class Customer(c_custkey: Long, c_name: String, c_nationkey: Int,
      c_acctbal: Double, c_mktsegment: String)
  final case class Part(p_partkey: Long, p_name: String, p_brand: String,
      p_type: String, p_size: Int, p_retailprice: Double)
  final case class Order(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
      o_totalprice: Double, o_orderdate: LocalDateTime, o_orderpriority: String)
  final case class Lineitem(l_orderkey: Long, l_partkey: Long, l_suppkey: Long,
      l_linenumber: Int, l_quantity: Double, l_extendedprice: Double,
      l_discount: Double, l_tax: Double, l_returnflag: String,
      l_linestatus: String, l_shipdate: LocalDateTime)
  final case class Event(event_id: Long, ts: LocalDateTime, user_id: Long,
      event_type: String, value: Double, props: String)
  final case class Document(doc_id: Long, text: String, lang: String,
      source: String, n_chars: Long)
  final case class Embedding(vec_id: Long, embedding: Array[Float], label: Int)

  // ---- value domains (measured from the driver corpus) ----
  private val RegionNames = Array("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")
  private val Segments = Array("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
  private val PartAdjectives = Array("large", "hot", "blue", "old", "cold", "small", "green", "dark")
  private val PartNouns = Array("ring", "bolt", "plate", "screw", "nut", "washer", "gear", "cap")
  private val PartTypes = Array("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD")
  private val OrderStatuses = Array("F", "O", "P")
  private val Priorities = Array("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
  private val ReturnFlags = Array("A", "N", "R")
  private val LineStatuses = Array("F", "O")
  private val EventTypes = Array("click", "error", "purchase", "signup", "view")
  private val Langs = Array("de", "es", "fr", "zh") // en handled at ~41%
  /** The driver corpus' 30-token vocabulary ("dup" appears ONLY in near-dup copies). */
  private val Vocab = Array(
    "spark", "window", "merge", "table", "column", "vector", "stream", "value",
    "data", "small", "join", "filter", "big", "group", "hash", "customer",
    "sort", "order", "slow", "line", "part", "fast", "the", "row",
    "agg", "key", "query", "a", "scan", "batch")

  // the driver corpus is NAIVE timestamps (parquet TIMESTAMP_NTZ); all
  // instants below are naive-UTC epoch arithmetic
  private val DaySec = 86400L
  private val OrderEpoch0 = 788918400L      // 1995-01-01T00:00
  private val OrderDays = 2404              // … 2001-08-01 inclusive
  private val ShipEpoch0 = 789004800L       // 1995-01-02T00:00
  private val ShipDays = 2499               // … 2001-11-04 inclusive
  private val EventEpoch0 = 1704067200L     // 2024-01-01T00:00
  private val EventSpanUs = 30L * 86400L * 1000000L // 30 days, µs precision

  private def atEpochSec(sec: Long, micros: Long = 0L): LocalDateTime =
    LocalDateTime.ofEpochSecond(sec, (micros * 1000L).toInt, ZoneOffset.UTC)

  // ---- tables ----

  def region(spark: SparkSession): DataFrame = {
    import spark.implicits._
    RegionNames.indices.map(i => Region(i, RegionNames(i))).toDF()
  }

  def nation(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (0 until 25).map(i => Nation(i, s"NATION_$i", i % 5)).toDF()
  }

  def supplier(spark: SparkSession, sf: Double): DataFrame = {
    import spark.implicits._
    spark.range(0, nSupplier(sf), 1, parts(nSupplier(sf))).map { i =>
      val r = new RowRng(TagSupplier, i)
      Supplier(i, f"Supplier#$i%09d", r.int(25), round2(-1000 + r.uniform() * 11000))
    }.toDF()
  }

  def customer(spark: SparkSession, sf: Double): DataFrame = {
    import spark.implicits._
    spark.range(0, nCustomer(sf), 1, parts(nCustomer(sf))).map { i =>
      val r = new RowRng(TagCustomer, i)
      Customer(i, f"Customer#$i%09d", r.int(25),
        round2(-1000 + r.uniform() * 11000), Segments(r.int(5)))
    }.toDF()
  }

  def part(spark: SparkSession, sf: Double): DataFrame = {
    import spark.implicits._
    spark.range(0, nPart(sf), 1, parts(nPart(sf))).map { i =>
      val r = new RowRng(TagPart, i)
      Part(i, PartAdjectives(r.int(8)) + " " + PartNouns(r.int(8)),
        "Brand#" + (1 + r.int(25)), PartTypes(r.int(6)), 1 + r.int(50),
        900.0 + (i % 1000) / 10.0)
    }.toDF()
  }

  def orders(spark: SparkSession, sf: Double): DataFrame = {
    import spark.implicits._
    val nCust = nCustomer(sf)
    spark.range(0, nOrders(sf), 1, parts(nOrders(sf))).map { i =>
      val r = new RowRng(TagOrders, i)
      Order(i, r.long(nCust), OrderStatuses(r.int(3)),
        round2(1000 + r.uniform() * 499000),
        atEpochSec(OrderEpoch0 + r.int(OrderDays) * DaySec),
        Priorities(r.int(5)))
    }.toDF()
  }

  /** Each row draws its orderkey uniformly over the order domain — the
    * per-order fanout is Binomial(6M·sf, 1/1.5M·sf) ≈ Poisson(4), the
    * measured driver shape (mode 3–4, ~1.8% of orderkeys absent).
    */
  def lineitem(spark: SparkSession, sf: Double): DataFrame = {
    import spark.implicits._
    val (nOrd, nPrt, nSup) = (nOrders(sf), nPart(sf), nSupplier(sf))
    spark.range(0, nLineitem(sf), 1, parts(nLineitem(sf))).map { i =>
      val r = new RowRng(TagLineitem, i)
      Lineitem(r.long(nOrd), r.long(nPrt), r.long(nSup), 1 + r.int(7),
        (1 + r.int(50)).toDouble, round2(900 + r.uniform() * 104100),
        r.int(11) / 100.0, r.int(9) / 100.0,
        ReturnFlags(r.int(3)), LineStatuses(r.int(2)),
        atEpochSec(ShipEpoch0 + r.int(ShipDays) * DaySec))
    }.toDF()
  }

  def events(spark: SparkSession, sf: Double): DataFrame = {
    import spark.implicits._
    val nUsr = nUsers(sf)
    spark.range(0, nEvents(sf), 1, parts(nEvents(sf))).map { i =>
      val r = new RowRng(TagEvents, i)
      val offUs = r.long(EventSpanUs)
      val ts = atEpochSec(EventEpoch0 + offUs / 1000000L, offUs % 1000000L)
      // value ~ Exponential(mean 50): measured mean 49.9 / median 34.8 / p90 114
      Event(i, ts, r.long(nUsr), EventTypes(r.int(5)),
        round2(-50.0 * math.log1p(-r.uniform())), s"""{"k": ${r.int(100)}}""")
    }.toDF()
  }

  /** Raw (pre-dup) token stream of doc `j` — a pure function of `j`, so
    * a near-dup row can rebuild its base's text without reading it.
    */
  private def rawTokens(j: Long): Array[String] = {
    val r = new RowRng(TagDocText, j)
    Array.fill(10 + r.int(91))(Vocab(r.int(30)))
  }

  /** ~5% of docs are NEAR-DUP copies of a random earlier doc: the
    * base's token stream with the last two tokens replaced by "dup" +
    * one fresh token (measured driver shape: 5.0% of docs carry the
    * "dup" marker; long shared prefixes across unrelated doc_ids).
    * lang ≈ 41% en, rest uniform; source = src(doc_id % 20) exactly.
    */
  def documents(spark: SparkSession, sf: Double): DataFrame = {
    import spark.implicits._
    spark.range(0, nDocuments(sf), 1, parts(nDocuments(sf))).map { i =>
      val m = new RowRng(TagDocMeta, i)
      val dup = m.uniform() < 0.05 && i > 0
      val toks =
        if (dup) rawTokens(m.long(i)).dropRight(2) ++ Array("dup", Vocab(m.int(30)))
        else rawTokens(i)
      val text = toks.mkString(" ")
      val lang = if (m.uniform() < 0.41) "en" else Langs(m.int(4))
      Document(i, text, lang, "src" + (i % 20), text.length.toLong)
    }.toDF()
  }

  /** Unit-normalized 64-dim gaussian vectors; label is an INDEPENDENT
    * uniform 0..9 (measured: intra-label and inter-label cosine are
    * both ~0 ± 0.125 — the driver corpus has no cluster structure).
    */
  def embeddings(spark: SparkSession, sf: Double): DataFrame = {
    import spark.implicits._
    spark.range(0, nEmbeddings(sf), 1, parts(nEmbeddings(sf))).map { i =>
      val r = new RowRng(TagEmbeddings, i)
      val v = Array.fill(64)(r.gaussian())
      val nrm = math.sqrt(v.map(x => x * x).sum)
      Embedding(i, v.map(x => (x / nrm).toFloat), r.int(10))
    }.toDF()
  }

  def tables(spark: SparkSession, sf: Double): Seq[(String, DataFrame)] = Seq(
    "region" -> region(spark), "nation" -> nation(spark),
    "supplier" -> supplier(spark, sf), "customer" -> customer(spark, sf),
    "part" -> part(spark, sf), "orders" -> orders(spark, sf),
    "lineitem" -> lineitem(spark, sf), "events" -> events(spark, sf),
    "documents" -> documents(spark, sf), "embeddings" -> embeddings(spark, sf))

  /** Write every table as `outDir/<name>.parquet` (directory form —
    * `Tables.load` reads files and directories identically).
    */
  def generate(spark: SparkSession, sf: Double, outDir: String): Unit =
    tables(spark, sf).foreach { case (name, df) =>
      df.write.mode(SaveMode.Overwrite).parquet(s"$outDir/$name.parquet")
    }

  /** `ScaleGen <sf> <outDir>` */
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: ScaleGen <sf> <outDir>")
    val sf = args(0).toDouble
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    try {
      val t0 = System.nanoTime()
      generate(spark, sf, args(1))
      println(f"generated sf=$sf corpus at ${args(1)} in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    } finally spark.stop()
  }
}
