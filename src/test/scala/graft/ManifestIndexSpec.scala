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
