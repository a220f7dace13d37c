package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic-corpus generator for the SCALING PROBE.
  *
  * `TESTDATA.md` caps the driver-generated data at sf0.1 (~600 k
  * lineitem rows), so every 100 TB claim in this repo is a design
  * argument until a query has actually been DRIVEN at a larger scale.
  * This main generates the same ten-table layout (schemas identical to
  * the driver's parquet, distributions matched to the measured shapes
  * of `/root/testdata/sf0.1` — key ranges, group weights, text
  * vocabulary, near-dup planting, unit-norm clustered embeddings) at
  * ANY scale factor, fully deterministically (every value is a pure
  * function of (SEED, table, row id) through xxhash64 — no RNG state,
  * so two invocations at one sf are byte-stable modulo parquet
  * encoding, and a 10× corpus is the SAME generative process, not a
  * replicated one — replication would plant every doc as a 10-way
  * exact dup and blow the near-dup families quadratically).
  *
  * Usage: `runMain graft.tools.ScaleGen <outDir> <sf>` — sf uses the
  * driver's convention (sf0.1 ≈ 600 k lineitem, sf1 ≈ 6 M).
  * region/nation are fixed-size TPC-H dimensions and are copied from
  * the reference testdata (read-only) verbatim.
  */
object ScaleGen {
  val Seed = 42L

  /** The sf0.1 documents vocabulary, measured: 31 tokens, ~uniform. */
  val Vocab: Seq[String] = Seq(
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window")

  private def h(cols: Column*): Column = xxhash64(lit(Seed) +: cols: _*)
  /** Uniform in [0, n) from a hash. */
  private def u(n: Long, cols: Column*): Column = pmod(h(cols: _*), lit(n))
  /** Uniform double in [0, 1) from a hash. */
  private def uf(cols: Column*): Column =
    (pmod(h(cols: _*), lit(1L << 40)).cast("double") / lit((1L << 40).toDouble))

  private def pick(options: Seq[String], cols: Column*): Column = {
    val arr = array(options.map(lit): _*)
    element_at(arr, (u(options.size.toLong, cols: _*) + 1L).cast("int"))
  }

  def main(args: Array[String]): Unit = {
    val out = args(0)
    val sf = args(1).toDouble
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    try generate(spark, out, sf) finally spark.stop()
  }

  def generate(spark: SparkSession, out: String, sf: Double): Unit = {
    def n(base: Long): Long = math.max(1L, math.round(base * sf))
    val nCustomer = n(150000)
    val nSupplier = n(10000)
    val nPart = n(200000)
    val nOrders = n(1500000)
    val nEvents = n(1000000)
    val nUsers = n(150000)
    // the driver floors the text/vector corpora at 500 rows (measured:
    // sf0.001 and sf0.01 both carry 500 docs/vecs; sf0.1 carries
    // 5000/2000)
    val nDocs = math.max(500L, n(50000))
    val nVecs = math.max(500L, n(20000))

    def write(name: String, df: DataFrame): Unit = {
      df.write.mode(SaveMode.Overwrite).parquet(s"$out/$name.parquet")
      println(s"[scalegen] $name -> $out/$name.parquet")
    }

    // fixed-size TPC-H dimensions: copied verbatim (scale-invariant)
    write("region", spark.read.parquet("/root/testdata/sf0.1/region.parquet"))
    write("nation", spark.read.parquet("/root/testdata/sf0.1/nation.parquet"))

    val id = col("id")

    write("customer", spark.range(nCustomer).select(
      id.as("c_custkey"),
      format_string("Customer#%09d", id).as("c_name"),
      u(25, id, lit("cnat")).cast("int").as("c_nationkey"),
      round(uf(id, lit("cbal")) * 10000.0, 2).as("c_acctbal"),
      pick(Seq("AUTOMOBILE", "BUILDING", "HOUSEHOLD", "MACHINERY", "FURNITURE"),
        id, lit("cseg")).as("c_mktsegment")))

    write("supplier", spark.range(nSupplier).select(
      id.as("s_suppkey"),
      format_string("Supplier#%09d", id).as("s_name"),
      u(25, id, lit("snat")).cast("int").as("s_nationkey"),
      round(uf(id, lit("sbal")) * 10000.0, 2).as("s_acctbal")))

    // two-word part names (the dedup_fuzzy_parts blocking shape)
    val adjs = Seq("large", "small", "hot", "cold", "old", "new", "blue",
      "red", "green", "dark", "pale", "fine")
    val nouns = Seq("ring", "bolt", "plate", "screw", "wheel", "gear",
      "pipe", "valve")
    write("part", spark.range(nPart).select(
      id.as("p_partkey"),
      concat_ws(" ", pick(adjs, id, lit("padj")), pick(nouns, id, lit("pnoun")))
        .as("p_name"),
      concat(lit("Brand#"), (u(25, id, lit("pbrand")) + 1L).cast("string"))
        .as("p_brand"),
      pick(Seq("LARGE", "MEDIUM", "ECONOMY", "PROMO", "SMALL", "STANDARD"),
        id, lit("ptype")).as("p_type"),
      (u(50, id, lit("psize")) + 1L).cast("int").as("p_size"),
      (lit(900.0) + pmod(id, lit(1000L)).cast("double") / 10.0).as("p_retailprice")))

    // orders over the 1995..2001 window the reference data spans
    val epoch95 = java.sql.Timestamp.valueOf("1995-01-01 00:00:00").getTime / 1000
    val span95 = java.sql.Timestamp.valueOf("2001-08-01 00:00:00").getTime / 1000 - epoch95
    val orders = spark.range(nOrders).select(
      id.as("o_orderkey"),
      u(nCustomer, id, lit("ocust")).as("o_custkey"),
      pick(Seq("F", "O", "P"), id, lit("ostat")).as("o_orderstatus"),
      round(uf(id, lit("ototal")) * 400000.0 + 1000.0, 2).as("o_totalprice"),
      timestamp_seconds(lit(epoch95) +
        (u(span95 / 86400, id, lit("odate")) * 86400L)).as("o_orderdate"),
      pick(Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"),
        id, lit("oprio")).as("o_orderpriority"))
    write("orders", orders)

    // lineitem: 1..7 lines per order (measured uniform linenumber),
    // generated by exploding a per-order line sequence — ~4·orders rows
    val li = spark.range(nOrders)
      .select(id.as("o"), explode(sequence(lit(1),
        (u(7, id, lit("lcount")) + 1L).cast("int"))).as("l_linenumber"))
    val lkey = Seq(col("o"), col("l_linenumber"))
    val qty = (u(50, lkey :+ lit("lqty"): _*) + 1L).cast("double")
    val unitPrice = lit(900.0) +
      pmod(u(nPart, lkey :+ lit("lpart"): _*), lit(12000L)).cast("double") / 10.0
    write("lineitem", li.select(
      col("o").as("l_orderkey"),
      u(nPart, lkey :+ lit("lpart"): _*).as("l_partkey"),
      u(nSupplier, lkey :+ lit("lsupp"): _*).as("l_suppkey"),
      col("l_linenumber"),
      qty.as("l_quantity"),
      round(qty * unitPrice, 2).as("l_extendedprice"),
      (u(11, lkey :+ lit("ldisc"): _*).cast("double") / 100.0).as("l_discount"),
      (u(9, lkey :+ lit("ltax"): _*).cast("double") / 100.0).as("l_tax"),
      pick(Seq("A", "N", "R"), lkey :+ lit("lflag"): _*).as("l_returnflag"),
      pick(Seq("O", "F"), lkey :+ lit("lstat"): _*).as("l_linestatus"),
      timestamp_seconds(lit(epoch95) +
        (u(span95 / 86400, col("o"), lit("odate")) * 86400L) +
        ((u(95, lkey :+ lit("lship"): _*) + 1L) * 86400L)).as("l_shipdate")))

    // events: 30-day window, 5 uniform types, exponential value mean 50
    // (measured avg≈49.9, std≈49.6), ~1/15 users-to-events ratio
    val epoch24 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime / 1000
    write("events", spark.range(nEvents).select(
      id.as("event_id"),
      timestamp_micros(lit(epoch24 * 1000000L) +
        (uf(id, lit("ets")) * 30.0 * 86400.0 * 1e6).cast("long")).as("ts"),
      u(nUsers, id, lit("euser")).as("user_id"),
      pick(Seq("click", "view", "purchase", "signup", "error"),
        id, lit("etype")).as("event_type"),
      round(-log(lit(1.0) - least(uf(id, lit("eval")), lit(0.99999))) * 50.0, 2)
        .as("value"),
      format_string("{\"k\": %d}", u(100, id, lit("eprops"))).as("props")))

    // documents: the measured 31-token vocabulary, 10..100 tokens/doc,
    // en-heavy languages, 20 sources, planted near-dups (~2%: an
    // earlier doc's token stream with sparse 'dup' substitutions) and
    // exact dups (~1%) — the structure the dedup families verify on
    val vocabArr = array(Vocab.map(lit): _*)
    val docs = spark.range(nDocs)
      .withColumn("dupKind",
        when(id >= 13L && u(97, id, lit("dexact")) === 0L, lit(2))
          .when(id >= 7L && u(50, id, lit("dnear")) === 0L, lit(1))
          .otherwise(lit(0)))
      .withColumn("gen",
        when(col("dupKind") === 2, id - 13L)
          .when(col("dupKind") === 1, id - 7L)
          .otherwise(id))
      .withColumn("n_tokens", (u(91, col("gen"), lit("dlen")) + 10L).cast("int"))
      .withColumn("toks", transform(
        sequence(lit(0), col("n_tokens") - 1),
        i => when(col("dupKind") === 1 && pmod(h(id, i, lit("dperturb")), lit(13L)) === 0L,
          lit("dup"))
          .otherwise(element_at(vocabArr,
            (u(Vocab.size.toLong, col("gen"), i, lit("dtok")) + 1L).cast("int")))))
      .withColumn("text", array_join(col("toks"), " "))
    write("documents", docs.select(
      id.as("doc_id"),
      col("text"),
      when(u(10, id, lit("dlang")) < 4L, lit("en"))
        .otherwise(pick(Seq("zh", "es", "fr", "de"), id, lit("dlang2"))).as("lang"),
      concat(lit("src"), u(20, id, lit("dsrc")).cast("string")).as("source"),
      length(col("text")).cast("long").as("n_chars")))

    // embeddings: 64-dim UNIT vectors clustered around 10 deterministic
    // label centroids (centroid + noise, then L2-normalized — all
    // native expressions, no UDF)
    val dims = 64
    val label = u(10, id, lit("vlabel")).cast("int")
    val raw = transform(sequence(lit(0), lit(dims - 1)), d =>
      (uf(col("label"), d, lit("vcent")) * 2.0 - 1.0) * 3.0 +
        (uf(id, d, lit("vnoise")) * 2.0 - 1.0))
    val norm = sqrt(aggregate(col("raw"), lit(0.0d), (acc, x) => acc + x * x))
    write("embeddings", spark.range(nVecs)
      .withColumn("label", label)
      .withColumn("raw", raw)
      .withColumn("nrm", norm)
      .select(
        id.as("vec_id"),
        transform(col("raw"), x => (x / col("nrm")).cast("float")).as("embedding"),
        col("label")))

    println(s"[scalegen] sf=$sf complete -> $out")
  }
}
