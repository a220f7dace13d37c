package graft.exec

import java.nio.file.{Files, Paths, StandardOpenOption}

import graft.artifacts.RunResult
import graft.parser.ContextFuncs

/** Structured event stream (reference core/dbt/events/types.py: typed
  * events with stable codes — MainReportVersion A001, NodeStart Q024,
  * NodeFinished Q025, CommandCompleted Q039 — serialized by the
  * json log format as `{"data": {...}, "info": {code, invocation_id,
  * level, msg, name, pid, thread, ts}}`).
  *
  * The engine's analogue appends one JSON line per event to
  * `<targetDir>/dbt.log` so external log consumers can parse run
  * telemetry instead of scraping console text. Emission is
  * open-append-close under a lock: events are node-granular (two per
  * node), so file-handle churn is noise while atomic lines are what
  * concurrent worker threads need.
  */
final class EventLog(targetDir: String, invocationId: String) {
  private val pid = ProcessHandle.current().pid()
  private val tsFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")
    .withZone(java.time.ZoneOffset.UTC)

  def emit(name: String, code: String, level: String, msg: String,
      data: Map[String, Any]): Unit = synchronized {
    val dir = Paths.get(targetDir)
    Files.createDirectories(dir)
    val line = ContextFuncs.toJson(Map(
      "data" -> data,
      "info" -> Map(
        "category" -> "",
        "code" -> code,
        "invocation_id" -> invocationId,
        "level" -> level,
        "msg" -> msg,
        "name" -> name,
        "pid" -> pid,
        "thread" -> Thread.currentThread().getName,
        "ts" -> tsFmt.format(java.time.Instant.now()))))
    Files.writeString(dir.resolve("dbt.log"), line + "\n",
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  def mainReportVersion(cmd: String): Unit =
    emit("MainReportVersion", "A001", "info", s"Running graft $cmd",
      Map("version" -> "1.0.0-graft", "log_version" -> 3L))

  def nodeStart(uniqueId: String): Unit =
    emit("NodeStart", "Q024", "debug", s"Began running node $uniqueId",
      Map("node_info" -> Map("unique_id" -> uniqueId)))

  def nodeFinished(r: RunResult): Unit =
    emit("NodeFinished", "Q025",
      if (Set("error", "fail").contains(r.status)) "error"
      else if (r.status == "warn") "warn" else "debug",
      s"Finished running node ${r.uniqueId}",
      Map("node_info" -> Map("unique_id" -> r.uniqueId),
        "run_result" -> Map(
          "status" -> r.status,
          "message" -> r.message,
          "execution_time" -> r.executionTime)))

  def commandCompleted(cmd: String, success: Boolean, elapsed: Double): Unit =
    emit("CommandCompleted", "Q039", "debug",
      s"Command `$cmd` ${if (success) "succeeded" else "failed"} " +
        f"in $elapsed%.2f seconds",
      Map("command" -> cmd, "success" -> success, "elapsed" -> elapsed))
}
