package graft

import java.util.concurrent.CountDownLatch

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.exec.RelationStore

/** Optimistic concurrency: two independent store handles over ONE
  * warehouse root committing to the same table. The protocol under
  * test: version slots are reserved by atomic no-overwrite marker
  * creation, the manifest rename is the commit, and a commit that gets
  * shadowed by a concurrent higher commit withdraws and re-commits
  * above the new head (re-referencing its staged files cross-dir).
  * Required outcome: a LINEAR version chain, no lost updates, and no
  * leaked garbage after vacuum.
  */
class ConcurrencySpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark = GraftSession.local(4)

  private def newRoot(): String =
    java.nio.file.Files.createTempDirectory("occ_wh").toString

  private def df(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("id", "v")
  }

  /** Run the thunks concurrently from a common start barrier; rethrow
    * the first failure.
    */
  private def inParallel(thunks: (() => Unit)*): Unit = {
    val start = new CountDownLatch(1)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = thunks.map { t =>
      new Thread(() => {
        start.await()
        try t() catch { case e: Throwable => errors.add(e) }
      })
    }
    threads.foreach(_.start())
    start.countDown()
    threads.foreach(_.join(120000))
    if (!errors.isEmpty) throw errors.peek()
  }

  /** Every data file under the table dir, relative to it. */
  private def dataFiles(root: String, table: String): Set[String] = {
    val base = java.nio.file.Paths.get(root, "main", table)
    if (!java.nio.file.Files.exists(base)) return Set.empty
    val out = scala.collection.mutable.Set[String]()
    java.nio.file.Files.walk(base).forEach { p =>
      val fn = p.getFileName.toString
      if (java.nio.file.Files.isRegularFile(p) && !fn.startsWith("_") && !fn.startsWith("."))
        out += base.relativize(p).toString
    }
    out.toSet
  }

  private def markers(root: String, table: String): Seq[String] = {
    val base = java.nio.file.Paths.get(root, "main", table)
    if (!java.nio.file.Files.exists(base)) return Nil
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.list(base).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("_rsv_v")).toSeq
  }

  test("concurrent full writes: linear chain, head is exactly one writer's content") {
    val root = newRoot()
    val a = new RelationStore(spark, root)
    val b = new RelationStore(spark, root)
    val rowsA = (0L until 50L).map(i => (i, "A"))
    val rowsB = (100L until 170L).map(i => (i, "B"))
    inParallel(
      () => a.write(df(rowsA), "t"),
      () => b.write(df(rowsB), "t"))
    // both committed: two versions, strictly ascending, head readable
    val fresh = new RelationStore(spark, root)
    val vs = fresh.versions("t")
    assert(vs.size == 2 && vs == vs.sorted, s"non-linear chain: $vs")
    val head = fresh.read("t").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(head == rowsA.toSet || head == rowsB.toSet,
      s"head must be exactly ONE writer's content, got ${head.size} rows")
    // the shadowed writer's commit is intact history, not a torn mix
    val prev = fresh.read("t", Some(vs.head)).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(Set(rowsA.toSet, rowsB.toSet) == Set(head, prev))
    // every surviving data file is referenced; vacuum with an expired
    // horizon leaves zero reservation markers and a clean chain
    val sweeper = new RelationStore(spark, root, tornRetainMs = 0L)
    sweeper.vacuum("t", keepLast = 1)
    assert(sweeper.versions("t").size == 1)
    assert(markers(root, "t").isEmpty, s"leaked reservations: ${markers(root, "t")}")
    assert(sweeper.read("t").count() == head.size)
  }

  test("concurrent delta landings + racing folds: both writers' rows all present") {
    val root = newRoot()
    val a = new RelationStore(spark, root, deltaFoldEvery = 3)
    val b = new RelationStore(spark, root, deltaFoldEvery = 3)
    // disjoint batch ids (two sources feeding one table); folds trigger
    // on both sides and race each other
    inParallel(
      () => (0 until 12 by 2).foreach(i =>
        a.appendDelta(df(Seq((i.toLong, s"a$i"))), "t", i.toLong)),
      () => (1 until 12 by 2).foreach(i =>
        b.appendDelta(df(Seq((i.toLong, s"b$i"))), "t", i.toLong)))
    val fresh = new RelationStore(spark, root)
    val out = fresh.read("t").collect().map(_.getLong(0)).sorted.toSeq
    assert(out == (0L until 12L), s"lost or duplicated landings: $out")
    val vs = fresh.versions("t")
    assert(vs == vs.sorted && vs.nonEmpty)
    // same-batch replay race: exactly one of two concurrent landings of
    // ONE batch id commits
    val landed = new java.util.concurrent.atomic.AtomicInteger(0)
    inParallel(
      () => if (a.appendDelta(df(Seq((77L, "x"))), "t", 77L)) landed.incrementAndGet(),
      () => if (b.appendDelta(df(Seq((77L, "y"))), "t", 77L)) landed.incrementAndGet())
    assert(landed.get() == 1, s"batch 77 landed ${landed.get()} times")
    assert(fresh.read("t").filter(col("id") === 77L).count() == 1)
  }

  test("concurrent partition-scoped commits to different partitions: no lost update") {
    val root = newRoot()
    val base = new RelationStore(spark, root)
    import spark.implicits._
    def pdf(rows: Seq[(Long, String, String)]) = rows.toDF("id", "v", "day")
    base.write(pdf(Seq(
      (1L, "old1", "d1"), (2L, "old2", "d2"), (3L, "old3", "d3"))), "t", Seq("day"))
    val a = new RelationStore(spark, root)
    val b = new RelationStore(spark, root)
    inParallel(
      () => a.writePartitions(pdf(Seq((10L, "newA", "d1"))), "t", Seq("day")),
      () => b.writePartitions(pdf(Seq((20L, "newB", "d2"))), "t", Seq("day")))
    // BOTH partition replacements survive (the shadowed commit re-bases
    // its carried set on the competitor's head), d3 carries untouched
    val out = new RelationStore(spark, root).read("t")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(out == Set((10L, "newA", "d1"), (20L, "newB", "d2"), (3L, "old3", "d3")),
      s"lost update: $out")
  }

  test("stale reservations (crashed writers) are reclaimed; live ones are protected") {
    val root = newRoot()
    val store = new RelationStore(spark, root)
    store.write(df(Seq((1L, "a"))), "t")
    // fake a crashed writer: reservation marker + partial staged data
    val td = new HPath(s"$root/main/t")
    val fs = td.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(new HPath(td, "v9"))
    val rsv = new HPath(td, "_rsv_v9")
    val out = fs.create(rsv, true); out.write("dead".getBytes); out.close()
    val junk = fs.create(new HPath(td, "v9/part-junk.parquet"), true)
    junk.write("partial".getBytes); junk.close()
    // young reservation: protected from a routine commit's GC
    store.write(df(Seq((2L, "b"))), "t")
    assert(fs.exists(rsv), "live-horizon reservation must survive routine GC")
    // stale reservation: reclaimed by vacuum under an expired horizon
    val sweeper = new RelationStore(spark, root, tornRetainMs = 0L)
    sweeper.vacuum("t", keepLast = 1)
    assert(!fs.exists(rsv), "stale reservation must be reclaimed")
    assert(!fs.exists(new HPath(td, "v9")), "crashed slot dir must be reclaimed")
    assert(sweeper.read("t").collect().map(_.getString(1)).toSeq == Seq("b"))
  }

  test("contended many-writer burst settles into a linear readable chain") {
    val root = newRoot()
    val writers = (0 until 4).map(_ => new RelationStore(spark, root))
    inParallel(writers.zipWithIndex.map { case (w, i) =>
      () => (0 until 3).foreach(r => w.write(df(Seq((i * 10L + r, s"w$i-r$r"))), "t"))
    }: _*)
    val fresh = new RelationStore(spark, root)
    val vs = fresh.versions("t")
    assert(vs == vs.sorted && vs.nonEmpty)
    // head = exactly one writer's final round (single full row)
    val head = fresh.read("t").collect()
    assert(head.length == 1, s"full write must fully replace, got ${head.length} rows")
    assert(head.head.getString(1).matches("w\\d-r2"), head.head.toString)
    val sweeper = new RelationStore(spark, root, tornRetainMs = 0L)
    sweeper.vacuum("t", keepLast = 1)
    assert(markers(root, "t").isEmpty)
    // every data file still on disk is referenced by the retained head
    val referenced = sweeper.read("t").inputFiles.map { f =>
      val marker = "/main/t/"
      f.substring(f.lastIndexOf(marker) + marker.length)
    }.toSet
    val onDisk = dataFiles(root, "t")
    assert(onDisk.subsetOf(referenced ++ onDisk.filter(_.startsWith("delta/"))),
      s"unreferenced leftovers: ${onDisk -- referenced}")
  }
}
