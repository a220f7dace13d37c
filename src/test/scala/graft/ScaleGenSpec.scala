package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.tools.ScaleGen

/** The scaling-probe generator (BENCH_SCALE.md) is only evidence if its
  * corpus is the driver corpus' shape at a bigger dial: same schemas,
  * same per-sf row formulas, same value domains, and bit-identical
  * output across re-generation (counter-mode RNG — content must not
  * depend on partitioning or task order).
  */
class ScaleGenSpec extends AnyFunSuite with BeforeAndAfterAll {
  val sf = 0.002
  var spark: SparkSession = _
  var dir: String = _
  override def beforeAll(): Unit = {
    spark = GraftSession.local(4)
    val d = java.nio.file.Files.createTempDirectory("graft_scalegen")
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      scala.util.Try {
        java.nio.file.Files.walk(d).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
      }))
    dir = d.toString
    ScaleGen.generate(spark, sf, dir)
  }

  test("schemas match the driver corpus exactly (names + types)") {
    graft.sources.Tables.all.foreach { name =>
      val gen = spark.read.parquet(s"$dir/$name.parquet").schema
        .map(f => (f.name, f.dataType))
      val ref = spark.read.parquet(s"/root/testdata/sf0.001/$name.parquet").schema
        .map(f => (f.name, f.dataType))
      assert(gen == ref, s"schema drift on $name: $gen vs $ref")
    }
  }

  test("row counts follow the driver per-sf formulas") {
    def n(t: String): Long = spark.read.parquet(s"$dir/$t.parquet").count()
    assert(n("region") == 5 && n("nation") == 25)
    assert(n("supplier") == ScaleGen.nSupplier(sf) && ScaleGen.nSupplier(sf) == 20)
    assert(n("customer") == 300 && n("part") == 400 && n("orders") == 3000)
    assert(n("lineitem") == 12000 && n("events") == 2000)
    // text/vector corpora floor at 500 (the driver's own floor —
    // sf0.001 and sf0.01 both carry 500 docs + 500 vecs)
    assert(n("documents") == 500 && n("embeddings") == 500)
  }

  test("re-generation is bit-identical (counter-mode determinism)") {
    // the WRITTEN corpus vs a freshly built DataFrame: any dependence on
    // partitioning, task order, or retry would diverge here
    Seq("lineitem", "events", "documents", "orders").foreach { t =>
      val a = spark.read.parquet(s"$dir/$t.parquet")
      val b = ScaleGen.tables(spark, sf).toMap.apply(t)
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"non-deterministic generation: $t")
    }
    val ea = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")(0).as("e0"))
    val eb = ScaleGen.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")(0).as("e0"))
    assert(ea.exceptAll(eb).isEmpty)
  }

  test("value domains and distribution shape match the measured driver corpus") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    assert(li.select("l_returnflag").distinct().collect().map(_.getString(0)).toSet
      == Set("A", "N", "R"))
    assert(li.agg(min("l_quantity"), max("l_quantity")).head() ==
      org.apache.spark.sql.Row(1.0, 50.0))
    // Poisson(4) fanout: some orderkeys absent (~e^-4 ≈ 1.8%)
    val distinctOrders = li.select("l_orderkey").distinct().count()
    assert(distinctOrders < 3000 && distinctOrders > 2800, s"fanout drift: $distinctOrders")

    val ev = spark.read.parquet(s"$dir/events.parquet")
    val meanV = ev.agg(avg("value")).head().getDouble(0)
    assert(math.abs(meanV - 50.0) < 5.0, s"event value mean drift: $meanV")
    assert(ev.filter(col("ts") < lit("2024-01-01") || col("ts") > lit("2024-01-31")).count() == 0)

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val dupFrac = docs.filter(col("text").contains("dup")).count().toDouble / 500
    assert(dupFrac > 0.0 && dupFrac < 0.12, s"near-dup rate drift: $dupFrac")
    // a dup doc shares its long prefix with its base (the LSH families'
    // candidate structure at scale depends on this)
    val prefixes = docs.select(substring(col("text"), 1, 60).as("p"))
      .groupBy("p").count().filter(col("count") > 1).count()
    assert(prefixes > 0, "no shared-prefix near-dup pairs generated")

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val norms = emb.select(sqrt(aggregate(col("embedding"), lit(0.0d),
      (acc, x) => acc + x * x)).as("n")).agg(min("n"), max("n")).head()
    assert(math.abs(norms.getDouble(0) - 1.0) < 1e-4 &&
      math.abs(norms.getDouble(1) - 1.0) < 1e-4, s"non-unit embeddings: $norms")
    assert(emb.select(size(col("embedding"))).distinct().head().getInt(0) == 64)
  }
}
