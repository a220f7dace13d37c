package graft.exec

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Runtime context surface (reference §2.5: the Jinja context functions
  * of core/dbt/context/base.py + providers.py re-expressed as methods —
  * `run_query`/`statement`, `store_result`/`load_result`, vars, logging,
  * invocation metadata). Available to programmatic "macros" (Scala
  * functions driving the engine) and to hooks.
  */
final class Context(
    val spark: SparkSession,
    val store: RelationStore,
    val vars: Map[String, String]) {

  /** reference providers.py:942 store_result / :921 load_result — the
    * statement-result registry, driver-side.
    */
  private val results = TrieMap[String, Seq[Row]]()

  /** reference `run_query` → execute and fetch (small results only —
    * this is the seam the reference uses for introspection queries,
    * never for data movement).
    */
  def runQuery(sql: String): Seq[Row] = spark.sql(sql).collect().toSeq

  /** Lazy variant when the caller wants to keep the plan distributed. */
  def query(sql: String): DataFrame = spark.sql(sql)

  def storeResult(name: String, rows: Seq[Row]): Unit = results(name) = rows
  def loadResult(name: String): Option[Seq[Row]] = results.get(name)

  /** reference base.py:235 var (with default). */
  def varOr(name: String, default: => String): String = vars.getOrElse(name, default)

  /** reference base.py:590 run_started_at / :618 invocation_id /
    * :625 thread_id.
    */
  val runStartedAt: java.time.Instant = java.time.Instant.now()
  val invocationId: String = java.util.UUID.randomUUID().toString
  def threadId: String = Thread.currentThread().getName

  /** reference base.py:215 dbt_version — the reference fork's version,
    * so macros branching on it behave identically.
    */
  val dbtVersion: String = "1.9.0b2"

  /** reference base.py:691 diff_of_two_dicts (the grants-diff helper). */
  def diffOfTwoDicts(a: Map[String, Any], b: Map[String, Any]): Any =
    graft.parser.ContextFuncs.call("diff_of_two_dicts", List(a, b))

  /** reference base.py:720 local_md5. */
  def localMd5(s: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** reference base.py:557 log. */
  def log(msg: String): Unit = System.err.println(s"[graft] $msg")

  /** Data-shaping context members (reference base.py:375-631) — same
    * implementations the parse-time template callables use
    * (parser.ContextFuncs; ControlFlow evaluates them inside `{{ }}`
    * spans and tag conditions).
    */
  def fromjson(s: String): Any = graft.parser.ContextFuncs.fromJson(s)
  def tojson(v: Any): String = graft.parser.ContextFuncs.toJson(v)
  def fromyaml(s: String): Any = graft.parser.MiniYaml.parse(s)
  def toyaml(v: Any): String = graft.parser.ContextFuncs.toYaml(v)
  def setOf(l: Seq[Any]): Seq[Any] = l.distinct
  def zipOf(ls: Seq[Any]*): Seq[Seq[Any]] =
    graft.parser.ContextFuncs.call("zip", ls.toList)
      .asInstanceOf[Seq[Seq[Any]]]

  /** reference base.py:630 `modules` (datetime/re subset) — same
    * dispatch the template evaluator uses; e.g.
    * `moduleCall("modules.datetime.datetime.strptime", List(s, f))`.
    */
  def moduleCall(name: String, args: List[Any],
      kw: Map[String, Any] = Map.empty): Any =
    graft.parser.Modules.call(name, args,
      scala.collection.immutable.ListMap.from(kw))
}
