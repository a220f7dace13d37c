package graft

import java.nio.file.Files

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.exec.ManifestFileIndex

/** The manifest-backed scan: explicit file lists spanning version
  * directories, typed partition values from path segments, and
  * partition pruning through the pushed filters.
  */
class ManifestIndexSpec extends AnyFunSuite with BeforeAndAfterAll {
  var spark: SparkSession = _
  var table: String = _

  override def beforeAll(): Unit = {
    spark = GraftSession.local(4)
    table = Files.createTempDirectory("mfi").toString
    val ss = spark
    import ss.implicits._
    // two "versions", each holding some partitions — the layout Spark's
    // directory inference refuses outright
    Seq((1L, "a", "2024-01-01"), (2L, "b", "2024-01-02"))
      .toDF("id", "v", "day")
      .write.partitionBy("day").mode("overwrite").parquet(s"$table/v0")
    Seq((9L, "z", "2024-01-02"), (7L, "y", "2024-01-03"))
      .toDF("id", "v", "day")
      .write.partitionBy("day").mode("overwrite").parquet(s"$table/v1")
  }

  private def filesUnder(rel: String): Seq[org.apache.hadoop.fs.FileStatus] = {
    val p = new HPath(s"$table/$rel")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(p).toSeq.filter(st => st.isFile && !st.getPath.getName.startsWith("_"))
  }

  test("cross-version partitioned file list scans, types, and prunes") {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, v STRING, day STRING")
    // the logical "current version": day 01 from v0, day 02 REPLACED by
    // v1's write, day 03 new in v1 — exactly a replaceWhere commit
    val byLeaf = Seq(
      "day=2024-01-01" -> filesUnder("v0/day=2024-01-01"),
      "day=2024-01-02" -> filesUnder("v1/day=2024-01-02"),
      "day=2024-01-03" -> filesUnder("v1/day=2024-01-03"))
    val df = ManifestFileIndex.datasetFor(spark, new HPath(table), schema,
      Seq("day"), byLeaf)
    // content: the carried + replaced + new partitions, nothing else
    val rows = df.select(col("id"), col("v"), col("day")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(rows == Set((1L, "a", "2024-01-01"), (9L, "z", "2024-01-02"),
      (7L, "y", "2024-01-03")))
    // pruning: a partition filter reaches the index — the scan reads
    // ONLY the matching leaf's files
    val pruned = df.filter(col("day") === "2024-01-02")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(1500))
    val scanned = pruned.queryExecution.executedPlan.collectLeaves()
      .head.metrics.get("numFiles")
    pruned.collect()
    assert(scanned.exists(_.value == 1), s"expected 1 file scanned, got $scanned")
    // typed partition values: a non-string partition column round-trips
    val ss = spark
    import ss.implicits._
    Seq((1L, 10L), (2L, 20L)).toDF("id", "bucket")
      .write.partitionBy("bucket").mode("overwrite").parquet(s"$table/vnum")
    val numSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, bucket BIGINT")
    val ndf = ManifestFileIndex.datasetFor(spark, new HPath(table), numSchema,
      Seq("bucket"),
      Seq("bucket=10" -> filesUnder("vnum/bucket=10"),
        "bucket=20" -> filesUnder("vnum/bucket=20")))
    assert(ndf.schema("bucket").dataType.typeName == "long")
    assert(ndf.filter(col("bucket") > 15L).select(sum(col("id"))).first().getLong(0) == 2L)
  }

  /** numFiles metric of the (single) scan leaf after executing `df`. */
  private def filesOpened(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan.collectLeaves()
      .head.metrics("numFiles").value
  }

  test("file-level data skipping: selective predicates open only overlapping files") {
    val ss = spark
    import ss.implicits._
    val store = new graft.exec.RelationStore(spark,
      java.nio.file.Files.createTempDirectory("skip_wh").toString)
    // four files with DISJOINT id ranges (range-clustered write) and
    // range-correlated strings
    val data = (0L until 400L).map(i => (i, f"k$i%04d")).toDF("id", "v")
    store.write(data.repartitionByRange(4, col("id")), "t_skip")
    val t = store.read("t_skip")
    assert(t.inputFiles.length == 4)
    // point lookup on an unpartitioned column: ONE file opened
    assert(filesOpened(t.filter(col("id") === 7L)) == 1)
    assert(t.filter(col("id") === 7L).select(col("v")).first().getString(0) == "k0007")
    // range predicate: only the top file overlaps
    assert(filesOpened(t.filter(col("id") >= 350L)) == 1)
    assert(t.filter(col("id") >= 350L).count() == 50)
    // string bounds skip too
    assert(filesOpened(t.filter(col("v") === "k0399")) == 1)
    // IN list spanning two disjoint ranges opens exactly those two
    assert(filesOpened(t.filter(col("id").isin(5L, 395L))) == 2)
    assert(t.filter(col("id").isin(5L, 395L)).count() == 2)
    // a non-selective predicate still reads everything, and the answer
    // is identical to the in-memory filter (skipping is sound)
    assert(t.filter(col("id") >= 0L).count() == 400)
    assert(t.filter(col("id") % 100 === 3L).collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(3L, 103L, 203L, 303L))
  }

  test("data skipping through folds: landed delta files keep their ranges") {
    val ss = spark
    import ss.implicits._
    val store = new graft.exec.RelationStore(spark,
      java.nio.file.Files.createTempDirectory("skipf_wh").toString, deltaFoldEvery = 3)
    def batch(lo: Long, hi: Long) =
      (lo until hi).map(i => (i, s"d$i")).toDF("id", "txt").coalesce(1)
    (0 to 2).foreach(b => store.appendDelta(batch(b * 100L, b * 100L + 100L), "t", b.toLong))
    // fold happened (3 landings): manifest entries carry footer stats
    assert(store.versions("t").nonEmpty)
    val t = store.read("t")
    assert(t.inputFiles.length == 3)
    assert(filesOpened(t.filter(col("id") === 205L)) == 1)
    assert(t.filter(col("id") === 205L).count() == 1)
    assert(t.count() == 300)
  }

  test("decimal column stats: skipping works on the warehouse measure type") {
    val ss = spark
    import ss.implicits._
    val store = new graft.exec.RelationStore(spark,
      java.nio.file.Files.createTempDirectory("skipd_wh").toString)
    // TPC-H-shaped measures: DECIMAL(12,2) (INT64-encoded) and a
    // >18-precision DECIMAL(22,4) (fixed-len-byte-array-encoded), both
    // range-correlated with the clustering column
    val data = (0L until 400L).map(i => (i, s"r$i")).toDF("id", "v")
      .withColumn("qty", expr("CAST(id AS DECIMAL(12,2)) + 0.25"))
      .withColumn("price", expr("CAST(id AS DECIMAL(22,4)) * 1000 + 0.5"))
      .repartitionByRange(4, col("id"))
    store.write(data, "t_dec")
    val t = store.read("t_dec")
    assert(t.inputFiles.length == 4)
    // q6's shape — a range predicate on a decimal measure — opens only
    // the overlapping file
    assert(filesOpened(t.filter(expr("qty < CAST(24 AS DECIMAL(12,2))"))) == 1)
    assert(t.filter(expr("qty < CAST(24 AS DECIMAL(12,2))")).count() == 24)
    // point lookup on the INT64-encoded decimal
    assert(filesOpened(t.filter(expr("qty = CAST(307.25 AS DECIMAL(12,2))"))) == 1)
    assert(t.filter(expr("qty = CAST(307.25 AS DECIMAL(12,2))")).count() == 1)
    // range on the FLBA-encoded high-precision decimal
    assert(filesOpened(t.filter(expr("price >= CAST(350000 AS DECIMAL(22,4))"))) == 1)
    assert(t.filter(expr("price >= CAST(350000 AS DECIMAL(22,4))")).count() == 50)
    // soundness: a non-selective decimal predicate loses no rows
    assert(t.filter(expr("qty >= CAST(0 AS DECIMAL(12,2))")).count() == 400)
  }

  test("decimal stats survive folds via the landing-time sidecar") {
    val ss = spark
    import ss.implicits._
    val store = new graft.exec.RelationStore(spark,
      java.nio.file.Files.createTempDirectory("skipdf_wh").toString, deltaFoldEvery = 3)
    def batch(lo: Long) = (lo until lo + 100L).map(i => (i, s"d$i")).toDF("id", "txt")
      .withColumn("amt", expr("CAST(id AS DECIMAL(12,2))")).coalesce(1)
    (0 to 2).foreach(b => store.appendDelta(batch(b * 100L), "t", b.toLong))
    assert(store.versions("t").nonEmpty) // fold happened
    val t = store.read("t")
    assert(t.inputFiles.length == 3)
    assert(filesOpened(t.filter(expr("amt = CAST(205 AS DECIMAL(12,2))"))) == 1)
    assert(t.filter(expr("amt = CAST(205 AS DECIMAL(12,2))")).count() == 1)
  }

  test("folds take their stats from the landing sidecar — zero footer opens") {
    val ss = spark
    import ss.implicits._
    val store = new graft.exec.RelationStore(spark,
      java.nio.file.Files.createTempDirectory("skips_wh").toString, deltaFoldEvery = 64)
    def batch(lo: Long) =
      (lo until lo + 100L).map(i => (i, s"d$i")).toDF("id", "txt").coalesce(1)
    (0 to 2).foreach(b => store.appendDelta(batch(b * 100L), "t", b.toLong))
    val before = graft.exec.FileStats.footerReads.get()
    assert(store.foldDeltas("t") == 3)
    assert(graft.exec.FileStats.footerReads.get() == before,
      "fold must read sidecars, not parquet footers")
    // and the carried stats still skip
    val t = store.read("t")
    assert(filesOpened(t.filter(col("id") === 205L)) == 1)
    assert(t.count() == 300)
  }

  test("compaction range-clusters rewrites: selective scans open fewer files than before") {
    val ss = spark
    import ss.implicits._
    val store = new graft.exec.RelationStore(spark,
      java.nio.file.Files.createTempDirectory("skipc_wh").toString)
    // hash-scattered small files: every file spans nearly the full id
    // range, so a selective scan can skip nothing
    val data = (0L until 400L).map(i => (i, s"r$i")).toDF("id", "v")
    store.write(data.repartition(8), "t_clu")
    val before = store.read("t_clu")
    val openedBefore = filesOpened(before.filter(col("id") < 50L))
    assert(openedBefore >= 4, s"hash layout must defeat skipping, opened $openedBefore")
    assert(store.compact("t_clu") == 1)
    val after = store.read("t_clu")
    val openedAfter = filesOpened(after.filter(col("id") < 50L))
    assert(openedAfter < openedBefore,
      s"post-compaction scan must open fewer files ($openedAfter vs $openedBefore)")
    assert(after.filter(col("id") < 50L).count() == 50)
    assert(after.count() == 400)
  }

  test("two-column Z-order compaction keeps skipping selective on BOTH predicate columns") {
    val ss = spark
    import ss.implicits._
    val store = new graft.exec.RelationStore(spark,
      java.nio.file.Files.createTempDirectory("skipz_wh").toString)
    // two INDEPENDENT predicate dimensions (a 64×64 grid), hash-
    // scattered into 16 small files: before compaction neither
    // dimension can skip anything
    val rows = for { i <- 0L until 64L; j <- 0L until 64L } yield (i, j)
    val data = rows.toDF("x", "y").repartition(16)
    store.write(data, "t_sorted")
    store.write(data, "t_z")
    val hconf = spark.sessionState.newHadoopConf()
    def bytesOf(df: org.apache.spark.sql.DataFrame): Long = df.inputFiles.map { f =>
      val p = new HPath(f); p.getFileSystem(hconf).getFileStatus(p).getLen
    }.sum
    // target ≈ a quarter of the table ⇒ ~4 output files either way
    val target = bytesOf(store.read("t_sorted")) / 4 + 1
    // the single-column default: sorted by the leading column only
    assert(store.compact("t_sorted", target) == 1)
    val sorted = store.read("t_sorted")
    val nSorted = sorted.inputFiles.length
    assert(nSorted >= 3, s"expected a multi-file rewrite, got $nSorted")
    assert(filesOpened(sorted.filter(col("x") < 8L)) < nSorted)
    // … and the SECOND dimension regresses to zero selectivity: every
    // x-sorted output file spans the full y range
    assert(filesOpened(sorted.filter(col("y") < 8L)) == nSorted,
      "single-column sort must leave no y selectivity (the motivating regression)")
    // Z-order: Morton-interleaved rewrite — tight envelopes in BOTH dims
    assert(store.compact("t_z", target, clusterColumns = Seq("x", "y")) == 1)
    val z = store.read("t_z")
    val nZ = z.inputFiles.length
    assert(nZ >= 3, s"expected a multi-file rewrite, got $nZ")
    assert(filesOpened(z.filter(col("x") < 8L)) < nZ,
      "zorder must keep x-skipping selective")
    assert(filesOpened(z.filter(col("y") < 8L)) < nZ,
      "zorder must make y-skipping selective too")
    // soundness: clustered layouts change which files hold which rows,
    // never the answer
    assert(z.filter(col("x") < 8L).count() == 8 * 64)
    assert(z.filter(col("y") < 8L).count() == 8 * 64)
    assert(z.count() == 64 * 64)
    // an explicit two-column request including a non-orderable column
    // REFUSES instead of silently degrading to a one-column sort (which
    // would produce exactly the second-dimension regression the flag
    // exists to avoid)
    val sdata = (0L until 400L).map(i => (i, s"s$i")).toDF("id", "label")
    store.write(sdata.repartition(8), "t_strz")
    val e = intercept[IllegalArgumentException](
      store.compact("t_strz", bytesOf(store.read("t_strz")) / 4 + 1,
        clusterColumns = Seq("id", "label")))
    assert(e.getMessage.contains("label") && e.getMessage.contains("Z-order"),
      e.getMessage)
    // a non-orderable FIRST column with two orderable LATER ones must
    // refuse too: the Z pair is the first two REQUESTED columns — a
    // silently substituted later pair would cluster a different layout
    // than the one the CLI reports
    val mixed = (0L until 400L).map(i => (s"s$i", i, i % 20)).toDF("label", "x", "y")
    store.write(mixed.repartition(8), "t_mix")
    val e2 = intercept[IllegalArgumentException](
      store.compact("t_mix", bytesOf(store.read("t_mix")) / 4 + 1,
        clusterColumns = Seq("label", "x", "y")))
    assert(e2.getMessage.contains("'label'"), e2.getMessage)
  }

  test("partition pruning composes with file-level skipping inside the surviving partition") {
    val ss = spark
    import ss.implicits._
    val store = new graft.exec.RelationStore(spark,
      java.nio.file.Files.createTempDirectory("skipp_wh").toString)
    // two day-partitions, each range-clustered into two id-disjoint files
    val data = (0L until 200L).map(i => (i, if (i < 100) "d1" else "d2")).toDF("id", "day")
      .repartitionByRange(4, col("day"), col("id"))
    store.write(data, "t_pp", partitionBy = Seq("day"))
    val t = store.read("t_pp")
    assert(t.inputFiles.length == 4)
    // partition filter alone halves the files; adding a selective id
    // predicate prunes WITHIN the surviving partition too
    assert(filesOpened(t.filter(col("day") === "d1")) == 2)
    val both = t.filter(col("day") === "d1" && col("id") < 25L)
    assert(filesOpened(both) == 1, "partition pruning + stats skipping must compose")
    assert(both.count() == 25)
    // and the combined plan's answer matches the unpruned computation
    assert(t.filter(col("id") < 25L).count() == 25)
  }

  test("listFiles binds partition filters per spark.sql.caseSensitive") {
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Literal}
    import org.apache.spark.sql.types._
    import org.apache.spark.unsafe.types.UTF8String
    val pSchema = StructType(Seq(StructField("Day", StringType)))
    val entries = Seq(
      (org.apache.spark.sql.catalyst.InternalRow(UTF8String.fromString("a")),
        filesUnder("v0/day=2024-01-01").map(st => (st, None: Option[graft.exec.FileStats]))),
      (org.apache.spark.sql.catalyst.InternalRow(UTF8String.fromString("b")),
        filesUnder("v1/day=2024-01-02").map(st => (st, None: Option[graft.exec.FileStats]))))
    val idx = new ManifestFileIndex(new HPath(table), pSchema, entries)
    // a filter arriving with different case binds under the default
    // case-insensitive resolution
    val filt = EqualTo(AttributeReference("dAY", StringType)(),
      Literal(UTF8String.fromString("b"), StringType))
    val dirs = idx.listFiles(Seq(filt), Nil)
    assert(dirs.size == 1 && dirs.head.files.nonEmpty)
  }

  test("mayMatch is conservative: nulls, Not-equality, prefixes, missing stats") {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types._
    import org.apache.spark.unsafe.types.UTF8String
    import graft.exec.{ColumnStats, FileStats}
    val a = AttributeReference("x", LongType)()
    val s = AttributeReference("v", StringType)()
    val fs = FileStats(100L, Map(
      "x" -> ColumnStats(Some(10L), Some(20L), 0L),
      "v" -> ColumnStats(Some(UTF8String.fromString("mm")),
        Some(UTF8String.fromString("pz")), 5L)))
    def m(e: Expression) = FileStats.mayMatch(e, fs, fs.cols.get)
    assert(!m(EqualTo(a, Literal(5L))))
    assert(m(EqualTo(a, Literal(15L))))
    assert(!m(GreaterThan(a, Literal(20L))))
    assert(m(GreaterThanOrEqual(a, Literal(20L))))
    assert(!m(LessThan(a, Literal(10L))))
    // null-count driven
    assert(!m(IsNull(a)))
    assert(m(IsNull(s)))
    assert(m(IsNotNull(a)))
    // Not(=) skips only constant files
    assert(m(Not(EqualTo(a, Literal(15L)))))
    val const = FileStats(10L, Map("x" -> ColumnStats(Some(7L), Some(7L), 0L)))
    assert(!FileStats.mayMatch(Not(EqualTo(a, Literal(7L))), const, const.cols.get))
    // NOT IN: skips exactly when the file is constant at a listed value
    assert(!FileStats.mayMatch(Not(In(a, Seq(Literal(7L), Literal(9L)))),
      const, const.cols.get))
    assert(FileStats.mayMatch(Not(In(a, Seq(Literal(8L)))), const, const.cols.get))
    // null-count completeness: an ALL-null column satisfies no value
    // predicate (comparisons, In, !=) but still answers IS NULL
    val allNull = FileStats(50L, Map("x" -> ColumnStats(None, None, 50L)))
    def an(e: Expression) = FileStats.mayMatch(e, allNull, allNull.cols.get)
    assert(!an(EqualTo(a, Literal(15L))))
    assert(!an(GreaterThan(a, Literal(0L))))
    assert(!an(Not(EqualTo(a, Literal(15L)))))
    assert(!an(In(a, Seq(Literal(1L), Literal(2L)))))
    assert(an(IsNull(a)) && !an(IsNotNull(a)))
    // StartsWith prefix windows
    def sw(p: String) = m(StartsWith(s, Literal(UTF8String.fromString(p), StringType)))
    assert(sw("n") && sw("mm") && sw("p"))
    assert(!sw("a") && !sw("q"))
    // unknown column / unknown shape ⇒ pass
    assert(m(EqualTo(AttributeReference("zz", LongType)(), Literal(1L))))
    assert(m(EqualTo(Cast(a, StringType), Literal(UTF8String.fromString("1"), StringType))))
    // And/Or composition
    assert(!m(And(EqualTo(a, Literal(15L)), EqualTo(a, Literal(5L)))))
    assert(m(Or(EqualTo(a, Literal(15L)), EqualTo(a, Literal(5L)))))
  }

  test("flat (unpartitioned) manifest scan and escaped partition values") {
    val ss = spark
    import ss.implicits._
    Seq((1L, "x"), (2L, "y")).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$table/vflat")
    val schema = org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, v STRING")
    val df = ManifestFileIndex.datasetFor(spark, new HPath(table), schema,
      Nil, Seq("" -> filesUnder("vflat")))
    assert(df.count() == 2 && df.columns.toSeq == Seq("id", "v"))
    // partition values with characters the writer must %-escape
    Seq((1L, "a b/c:d")).toDF("id", "k")
      .write.partitionBy("k").mode("overwrite").parquet(s"$table/vesc")
    val escLeaf = {
      val p = new HPath(s"$table/vesc")
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      fs.listStatus(p).map(_.getPath.getName).find(_.startsWith("k=")).get
    }
    val edf = ManifestFileIndex.datasetFor(spark, new HPath(table),
      org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, k STRING"),
      Seq("k"), Seq(escLeaf -> filesUnder(s"vesc/$escLeaf")))
    assert(edf.select(col("k")).first().getString(0) == "a b/c:d")
  }
}
