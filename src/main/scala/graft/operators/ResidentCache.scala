package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.SparkContext

/** At most ONE resident cached plan per (SparkContext, operator slot):
  * caching a new invocation's intermediate releases the previous one's —
  * the [[graft.operators.SimilarityOps]] PQ-loop unpersist discipline
  * applied to repeatedly-invoked two-pass operators, so a long-lived
  * JVM (bench sweeps, verify drives, notebooks, session-per-job
  * servers) holds bounded cache storage no matter how often the
  * operator runs.
  *
  * Keyed on the CONTEXT, not the session: Spark's `CacheManager` lives
  * in `SharedState`, shared by every `SparkSession.newSession()` child,
  * so a session-scoped key would pin one cached plan per dead session
  * until the JVM-wide context stops. Context-keying gives exactly
  * #slots resident plans per JVM; identical plans submitted from
  * sibling sessions reuse the one shared cache entry (`sameResult` is
  * session-independent), and replacing a slot unpersists through the
  * shared CacheManager regardless of which session wrote it.
  */
object ResidentCache {
  private val slots =
    new java.util.concurrent.ConcurrentHashMap[(SparkContext, String), DataFrame]()

  def apply(s: SparkSession, slot: String, df: DataFrame): DataFrame =
    slots.synchronized {
      // sweep entries of stopped contexts — their cached blocks died
      // with the executors; holding the plans would pin dead contexts
      // for the JVM lifetime
      slots.keySet.removeIf(_._1.isStopped)
      val key = (s.sparkContext, slot)
      val prev = slots.get(key)
      val prevWarm = prev != null &&
        prev.queryExecution.analyzed.sameResult(df.queryExecution.analyzed) &&
        // an external clearCache()/unpersist invalidates the entry —
        // returning a de-cached prev would silently reinstate the
        // double evaluation forever
        prev.storageLevel != org.apache.spark.storage.StorageLevel.NONE
      if (prevWarm) {
        // identical plan → the CacheManager already holds ONE shared
        // entry for it; re-invocation must REUSE the warm cache, not
        // cache-then-uncache it (unpersisting the "previous" df would
        // evict the shared plan entry and silently de-cache this one)
        prev
      } else {
        val cached = df.cache()
        val old = slots.put(key, cached)
        if (old != null && !(old eq cached) &&
            !old.queryExecution.analyzed.sameResult(cached.queryExecution.analyzed))
          old.unpersist(false)
        cached
      }
    }

  /** Test/inspection hook: live slot count for a context. */
  def liveSlots(sc: SparkContext): Int = slots.synchronized {
    var n = 0
    slots.keySet.forEach(k => if (k._1 eq sc) n += 1)
    n
  }

  /** Driver-side memo for SMALL trained models (centroid tables, PQ
    * codebooks — tens of rows by construction): train once per
    * (context, slot), then serve a LocalRelation rebuilt from the
    * collected rows. Two reasons this beats caching the training
    * plan: (1) the Lloyd-loop plans carry lambda expressions whose
    * canonical forms differ per invocation, so `sameResult` caching
    * misses and every consumer would retrain; (2) a LocalRelation
    * canonicalizes BY DATA, so every downstream plan built on the
    * model is `sameResult`-stable and the corpus-sized resident slots
    * above it actually warm. Include the data dir in the slot — the
    * memo pins the model for the JVM lifetime like a persisted index
    * artifact would.
    */
  private val models =
    new java.util.concurrent.ConcurrentHashMap[(SparkContext, String),
      (org.apache.spark.sql.types.StructType, Array[org.apache.spark.sql.Row])]()

  /** Keyed memo for DETERMINISTIC-but-not-`sameResult`-stable results —
    * fixpoint outputs whose lineage ends in per-invocation checkpoint
    * RDDs (connected components, k-core): the plan differs every run
    * even though the DATA is identical, so the slot cache above would
    * recompute per consumer. The memo runs `build` once per (context,
    * slot), materializes it eagerly (so the checkpoint blocks are
    * captured while they surely exist), and serves the SAME cached
    * DataFrame to every later consumer. MEMORY_AND_DISK — a
    * corpus-sized cluster table spills rather than OOMs; on a real
    * cluster this is the in-memory analogue of persisting the fixpoint
    * table, which [[graft.exec.RelationStore]] does for durable reuse.
    */
  private val memos =
    new java.util.concurrent.ConcurrentHashMap[(SparkContext, String), DataFrame]()

  def memo(s: SparkSession, slot: String)(build: => DataFrame): DataFrame =
    memos.synchronized {
      memos.keySet.removeIf(_._1.isStopped)
      val key = (s.sparkContext, slot)
      val prev = memos.get(key)
      if (prev != null &&
          prev.storageLevel != org.apache.spark.storage.StorageLevel.NONE) prev
      else {
        val built = build.cache()
        built.count()
        memos.put(key, built)
        built
      }
    }

  def localModel(s: SparkSession, slot: String)(train: => DataFrame): DataFrame = {
    models.synchronized { models.keySet.removeIf(_._1.isStopped) }
    val (schema, rows) = models.computeIfAbsent((s.sparkContext, slot), _ => {
      val d = train
      (d.schema, d.collect())
    })
    s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }
}
