package graft.exec

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Python-model execution bridge (reference parser
  * core/dbt/parser/models.py:31-173 + submit_python_job,
  * providers.py:1513).
  *
  * The parser ingests `.py` files under `models/` statically — `dbt.ref` /
  * `dbt.source` / `dbt.config` calls land in the manifest and DAG
  * exactly like SQL models. Execution dispatches through this registry:
  * on a real cluster the registered function is the job-submission seam
  * (e.g. hand the .py source to a PySpark batch endpoint and read the
  * result back); in-process there is no Python runtime, so deployments
  * register a typed JVM implementation per model instead. The inputs
  * map carries one DataFrame per `dbt.ref`/`dbt.source` the model
  * declared, keyed by ref spec / `source.table` — the same surface
  * `dbt.ref()` returns inside a Python model body.
  */
object PythonModels {
  type Impl = (SparkSession, Map[String, DataFrame]) => DataFrame

  private val impls = scala.collection.concurrent.TrieMap[String, Impl]()

  def register(name: String)(fn: Impl): Unit = impls(name) = fn
  def unregister(name: String): Unit = impls.remove(name)
  def get(name: String): Option[Impl] = impls.get(name)
}
