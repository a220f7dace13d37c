package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR plus the reference's own published benchmark —
  * parsing + DAG-linking a 2,000-trivial-model project (BASELINE.md:
  * dbt 1.x parses it in 41-72s on GHA; engine target ≤ 2x best).
  * Prints ONE JSON line.
  *
  * Methodology: fixed (sorted) execution order, MEDIAN of 3 runs per
  * query — a single-shot bench cannot distinguish a real regression
  * from background machine load (round-1 driver bench varied 2-5x
  * under load); the median of three is stable to ~20% across reruns.
  */
object Bench {
  private val Reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt

  /** Dead-store sink so the JIT cannot eliminate the sentinel spin. */
  @volatile private var sink: Long = 0L

  /** Machine-load sentinel: median-of-3 timings of a FIXED single-thread
    * CPU spin (100M xorshift64 steps). On an idle machine this is a
    * stable hardware constant; under co-tenant load it inflates
    * proportionally — emitted before/after the sweep so a reader of the
    * JSON can quantify contamination from the artifact alone instead of
    * guessing whether a slow tail was code or load.
    */
  private def loadSentinelMs(): Double = {
    def spin(): Double = {
      var x = 88172645463325252L
      val t0 = System.nanoTime()
      var i = 0
      while (i < 100000000) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
      sink = x
      (System.nanoTime() - t0) / 1e6
    }
    val ts = Seq(spin(), spin(), spin()).sorted
    math.round(ts(1) * 10) / 10.0
  }

  /** Multi-core load sentinel: wall time of `threads` concurrent
    * copies of the same fixed spin. The 1-thread sentinel above
    * CANNOT see a co-tenant that leaves one core free — a process
    * using half the machine's cores leaves the 1-thread spin at its
    * idle constant while a 32-task Spark stage loses half its
    * throughput (exactly the r15 driver pattern: c32 3-30x slower
    * than c8 on unchanged queries, sentinels clean). On an idle box
    * this reads ≈ the 1-thread constant; under an n-core co-tenant it
    * inflates by ~machine_cores/(machine_cores-n). Sampled before,
    * after, AND every 32 queries during the sweep so episodic bursts
    * are localized in time by the artifact itself.
    */
  private def mtSentinelMs(threads: Int): Double = {
    val t0 = System.nanoTime()
    val ws = (1 to threads).map { t =>
      new Thread(() => {
        var x = 88172645463325252L + t
        var i = 0
        while (i < 100000000) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
        sink = x
      })
    }
    ws.foreach(_.start()); ws.foreach(_.join())
    math.round((System.nanoTime() - t0) / 1e6 * 10) / 10.0
  }

  /** (steal, total) jiffies across all CPUs from /proc/stat — the
    * hypervisor-level CPU time taken by co-tenants, invisible to
    * in-guest load average and to any sentinel that happens to land
    * between bursts. Emitted as a before/after delta so a slow sweep
    * is attributable to the host from the artifact alone.
    */
  private def cpuSteal(): (Long, Long) =
    try {
      val line = scala.io.Source.fromFile("/proc/stat").getLines()
        .find(_.startsWith("cpu ")).getOrElse("")
      val f = line.split("\\s+").drop(1).map(_.toLong)
      (if (f.length > 7) f(7) else 0L, f.sum)
    } catch { case _: Throwable => (0L, 0L) }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // optional comma-separated query filter (same contract as Verify) —
    // dev iteration on one slow query without a 120-query sweep
    val only: Option[Set[String]] = args.headOption.map(_.split(",").toSet)
    val sentinelBefore = loadSentinelMs()
    val stealBefore = cpuSteal()
    val mtSamples = scala.collection.mutable.ListBuffer[(String, Double)]()
    mtSentinelMs(cpus) // discarded: first spin pays JIT for the loop body
    mtSamples += (("before", mtSentinelMs(cpus)))
    val spark = GraftSession.local(cpus)
    // untimed warmup: JIT + codegen + parquet footer caches, so the
    // first timed query isn't charged for JVM cold start
    try {
      SparkEntry.queries("q1_pricing_summary")(spark, sfDir).count()
      SparkEntry.queries("txt_stats")(spark, sfDir).count()
    } catch { case _: Throwable => () }
    val failed = scala.collection.mutable.ListBuffer[String]()
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .zipWithIndex
      .map { case ((name, fn), qi) =>
      if (qi % 32 == 0 && qi > 0) mtSamples += ((name, mtSentinelMs(cpus)))
      val raw = (1 to Reps).map { _ =>
        val t0 = System.nanoTime()
        // a failed rep must NOT masquerade as a fast time — record the
        // query as failed and pin its reported time to a sentinel
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable =>
            if (!failed.contains(name)) {
              failed += name
              System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            }
        }
        (System.nanoTime() - t0) / 1e9
      }
      val times = raw.sorted
      // lower-middle median: for even n this picks the faster half —
      // rep 1 pays one-time codegen/JIT for the whole pipeline (10s+
      // for the deep LSH plan), so the upper-middle of n=2 would
      // report pure cold-start cost, not steady-state throughput.
      // raw.head is ALSO kept (queries_cold below): for queries whose
      // first rep builds a resident-cache slot, the median hides that
      // one-time cost — the cold column makes the amortization visible
      // in the artifact instead of discarding it.
      (name,
        if (failed.contains(name)) -1.0 else times((times.size - 1) / 2),
        if (failed.contains(name)) -1.0 else raw.head)
    }
    // filtered runs are dev iteration on specific queries — skip the
    // fixed-cost engine benches
    val all =
      if (only.isDefined) results
      else {
        val p = parse2000Bench(); val r = runProjectBench(spark, sfDir)
        results :+ (("parse_2000_models", p, p)) :+ (("engine_run_60_models", r, r))
      }
    val qs = all.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val qsCold = all.map { case (k, _, c) => s"\"" + k + "\":" + c }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v, _) if v >= 0 => v }.sum
    val failedJson = failed.sorted.map(n => s"\"$n\"").mkString("[", ",", "]")
    val sentinelAfter = loadSentinelMs()
    mtSamples += (("after", mtSentinelMs(cpus)))
    val sentinelJson = s"""{"before_ms":$sentinelBefore,"after_ms":$sentinelAfter,""" +
      s""""work":"100e6 xorshift64 steps, 1 thread, median of 3"}"""
    val mtJson = s"""{"threads":$cpus,"work":"100e6 xorshift64 steps per thread, wall ms",""" +
      s""""samples":[${mtSamples.map { case (at, ms) => s"""["$at",$ms]""" }.mkString(",")}]}"""
    val stealAfter = cpuSteal()
    val stealJson = {
      val ds = stealAfter._1 - stealBefore._1
      val dt = stealAfter._2 - stealBefore._2
      val pct = if (dt > 0) math.round(ds.toDouble / dt * 1000) / 10.0 else -1.0
      s"""{"steal_jiffies":$ds,"total_jiffies":$dt,"steal_pct":$pct}"""
    }
    // resident-cache telemetry: stable counters under a timing drift
    // mean machine noise; rising evictions mean the working set
    // outgrew the cap and queries re-pay warm-up (sweep-order effect)
    val residentJson = graft.operators.ResidentCache.counters.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"$k\":$v" }.mkString("{", ",", "}")
    // end-of-sweep heap/storage telemetry: cumulative GC ms for the
    // whole run (a slow sweep with low gc_ms is NOT memory pressure)
    // and the block-manager storage footprint of every cached/
    // checkpointed RDD still live — together they separate "resident
    // caches outgrew the heap" from machine-state slowdowns in the
    // artifact itself.
    val gcMs = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    val storage = spark.sparkContext.getRDDStorageInfo
    val storageJson = s"""{"mem_bytes":${storage.map(_.memSize).sum},""" +
      s""""disk_bytes":${storage.map(_.diskSize).sum},"n_rdds":${storage.length}}"""
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"queries_cold":$qsCold,"failed":$failedJson,"load_sentinel":$sentinelJson,"load_sentinel_mt":$mtJson,"cpu_steal":$stealJson,"resident":$residentJson,"gc_ms":$gcMs,"storage":$storageJson,"sf":"$sfDir"}"""
    // stdout keeps the driver's ONE-JSON-LINE contract; the same record
    // is ALSO written to a file because the driver's tail capture has
    // truncated the giant line before (BENCH_r14.json "parsed": null —
    // per-query history survived for only 64 of 224 queries). The file
    // is the durable artifact; stderr gets a human summary.
    val outPath = Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LAST.json"))
    Files.writeString(outPath, json + "\n")
    println(json)
    System.err.println(f"[bench] wrote ${outPath.toAbsolutePath}: total=$total%.1f s, " +
      s"${results.size} queries, ${failed.size} failed")
    spark.stop()
  }

  /** Engine-execution throughput: parse + schedule + materialize a
    * 60-model project (20 staging views over the lineitem source, 20
    * ref-chained table marts, 20 second-level views) with 8 worker
    * threads at the bench scale factor. Measures the DAG scheduler +
    * materialization path, not query speed — the engine-side analogue
    * of `dbt run` wall time, which the reference delegates entirely to
    * the warehouse and therefore never reports.
    */
  def runProjectBench(spark: SparkSession, sfDir: String): Double = {
    val dir = Files.createTempDirectory("graft_run_bench")
    Files.createDirectories(dir.resolve("models"))
    Files.writeString(dir.resolve("dbt_project.yml"), "name: runbench\n")
    Files.writeString(dir.resolve("models/sources.yml"),
      s"""version: 2
         |sources:
         |  - name: tpch
         |    tables:
         |      - name: lineitem
         |        location: "$sfDir/lineitem.parquet"
         |""".stripMargin)
    (0 until 20).foreach { i =>
      Files.writeString(dir.resolve(s"models/stg_$i.sql"),
        s"SELECT l_orderkey, l_partkey, l_quantity FROM {{ source('tpch', 'lineitem') }} WHERE l_partkey % 20 = $i\n")
      Files.writeString(dir.resolve(s"models/mart_$i.sql"),
        s"{{ config(materialized='table') }}\n" +
          s"SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q FROM {{ ref('stg_$i') }} GROUP BY 1\n")
      Files.writeString(dir.resolve(s"models/top_$i.sql"),
        s"SELECT * FROM {{ ref('mart_$i') }} WHERE q > 40\n")
    }
    val t0 = System.nanoTime()
    val project = graft.parser.ProjectLoader.resolveRefs(
      graft.parser.ProjectLoader.load(dir.toString))
    val store = new graft.exec.RelationStore(spark, dir.resolve("wh").toString)
    val results = new graft.exec.Runner(spark, project, store,
      graft.exec.RunOptions(cmd = "run", threads = 8,
        targetDir = dir.resolve("target").toString)).execute()
    val sec = (System.nanoTime() - t0) / 1e9
    require(results.size == 60 && results.forall(_.status == "success"),
      s"run bench: ${results.count(_.status != "success")} failures of ${results.size}")
    sec
  }

  /** Mirror of reference performance/projects/01_2000_simple_models:
    * 2,000 one-line models (`select 1 as id`) each with a YAML file;
    * measures full parse + manifest + DAG link wall time.
    */
  def parse2000Bench(): Double = {
    val dir = Paths.get("/tmp/graft_parse_bench")
    if (!Files.exists(dir.resolve("dbt_project.yml"))) {
      Files.createDirectories(dir.resolve("models"))
      Files.writeString(dir.resolve("dbt_project.yml"), "name: perf\n")
      (0 until 2000).foreach { i =>
        Files.writeString(dir.resolve(s"models/node_$i.sql"), "select 1 as id\n")
        Files.writeString(dir.resolve(s"models/node_$i.yml"),
          s"""version: 2
             |models:
             |  - name: node_$i
             |    columns:
             |      - name: id
             |        tests:
             |          - not_null
             |""".stripMargin)
      }
    }
    val t0 = System.nanoTime()
    val project = graft.parser.ProjectLoader.resolveRefs(
      graft.parser.ProjectLoader.load(dir.toString))
    graft.graph.Linker.link(project.manifest)
    val sec = (System.nanoTime() - t0) / 1e9
    require(project.manifest.nodes.size >= 4000, s"parse bench saw ${project.manifest.nodes.size} nodes")
    sec
  }
}
