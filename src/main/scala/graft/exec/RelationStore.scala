package graft.exec

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.core.Relation

/** Versioned parquet relation store — the engine's warehouse.
  *
  * Every write creates a NEW immutable version directory and then
  * atomically swaps a pointer file, exactly the copy-on-write commit
  * discipline lakehouse table formats use. Consequences:
  *
  *  - a materialization can read the current version of its own target
  *    while writing the next (incremental merge = read + join + write,
  *    no read-overwrite conflict);
  *  - failed writes never corrupt the table (pointer still names the
  *    old version);
  *  - at cluster scale the same layout works on any Hadoop FS; only the
  *    pointer swap needs an atomic rename, which object stores provide
  *    for single keys.
  *
  * Views are stored as SQL text (`<name>.view.sql`) and re-registered as
  * session temp views on attach — mirroring `CREATE OR REPLACE VIEW`.
  */
final class RelationStore(val spark: SparkSession, val root: String, val schema: String = "main") {
  private def schemaDir: Path = Paths.get(root, schema)
  private def tableDir(name: String): Path = schemaDir.resolve(name)
  private def pointer(name: String): Path = tableDir(name).resolve("_current")
  private def viewFile(name: String): Path = schemaDir.resolve(s"$name.view.sql")

  def relation(name: String): Relation = Relation(schema, name)

  def exists(name: String): Boolean =
    Files.exists(pointer(name)) || Files.exists(viewFile(name))

  def isView(name: String): Boolean = Files.exists(viewFile(name))

  private def currentVersion(name: String): Option[Int] =
    if (Files.exists(pointer(name))) Some(Files.readString(pointer(name)).trim.toInt) else None

  def currentPath(name: String): Option[String] =
    currentVersion(name).map(v => tableDir(name).resolve(s"v$v").toString)

  def read(name: String): DataFrame = {
    if (isView(name)) spark.sql(Files.readString(viewFile(name)))
    else {
      val p = currentPath(name).getOrElse(
        throw new IllegalStateException(s"relation not found: $schema.$name"))
      val df = spark.read.parquet(p)
      // restore the exact written schema (column order + types): a
      // partitioned layout re-infers partition-column types on read,
      // which would otherwise drift (e.g. "2024-01-01" → DATE)
      val schemaFile = Paths.get(p, "_graft_schema.json")
      if (Files.exists(schemaFile)) {
        val stored = org.apache.spark.sql.types.DataType
          .fromJson(Files.readString(schemaFile))
          .asInstanceOf[org.apache.spark.sql.types.StructType]
        df.select(stored.fields.toSeq.map(f =>
          org.apache.spark.sql.functions.col(f.name).cast(f.dataType).as(f.name)): _*)
      } else df
    }
  }

  /** Write a new version and swap the pointer (the "commit").
    * `partitionBy` lays the version out as partitioned parquet dirs —
    * on a cluster that's what makes event-time `replaceWhere` windows
    * and partition-pruned scans O(touched partitions), not O(table).
    */
  def write(df: DataFrame, name: String, partitionBy: Seq[String] = Nil): Unit = {
    Files.createDirectories(tableDir(name))
    val next = currentVersion(name).getOrElse(-1) + 1
    val dest = tableDir(name).resolve(s"v$next")
    val writer = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
      .parquet(dest.toString)
    // leading "_" files are invisible to parquet FileIndex (like _SUCCESS)
    Files.writeString(dest.resolve("_graft_schema.json"), df.schema.json)
    val tmp = tableDir(name).resolve(s"_current.tmp$next")
    Files.writeString(tmp, next.toString)
    Files.move(tmp, pointer(name), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    // older versions are garbage; keep the previous one for time-travel-lite
    val stale = (0 until next - 1).map(v => tableDir(name).resolve(s"v$v")).filter(Files.exists(_))
    stale.foreach(deleteRecursively)
    registerView(name)
  }

  /** Store a logical view (SQL text) and register it in the session. */
  def writeView(name: String, sql: String): Unit = {
    Files.createDirectories(schemaDir)
    Files.writeString(viewFile(name), sql)
    spark.sql(sql).createOrReplaceTempView(name)
  }

  def drop(name: String): Unit = {
    if (Files.exists(tableDir(name))) deleteRecursively(tableDir(name))
    Files.deleteIfExists(viewFile(name))
    spark.catalog.dropTempView(name)
  }

  /** Shallow clone: new relation pointing at the same data version
    * (reference CloneRunner, core/dbt/task/clone.py:19-161; Spark-side
    * analogue of CREATE TABLE ... SHALLOW CLONE). Falls back to a view
    * when the source is a view.
    */
  def clone(fromStore: RelationStore, name: String): Unit = {
    if (fromStore.isView(name)) {
      val sql = Files.readString(fromStore.viewFile(name))
      writeView(name, sql)
    } else {
      val srcPath = fromStore.currentPath(name).getOrElse(
        throw new IllegalStateException(s"cannot clone missing relation $name"))
      // pointer-only clone: a view over the source's current version dir
      writeView(name, s"SELECT * FROM parquet.`$srcPath`")
    }
  }

  /** View definition text, if this relation is a view. */
  def viewSql(name: String): Option[String] =
    if (isView(name)) Some(Files.readString(viewFile(name))) else None

  /** SQL-addressable reference to this relation usable from ANOTHER
    * session/store (defer/clone): a direct parquet path for tables, an
    * inline subquery for views.
    */
  def addressable(name: String): Option[String] =
    if (isView(name)) viewSql(name).map(sql => s"(\n$sql\n)")
    else currentPath(name).map(p => s"parquet.`$p`")

  def list(): Seq[String] =
    if (!Files.exists(schemaDir)) Nil
    else {
      val ds = Files.list(schemaDir).iterator()
      val out = scala.collection.mutable.ListBuffer[String]()
      while (ds.hasNext) {
        val p = ds.next()
        val fn = p.getFileName.toString
        if (Files.isDirectory(p) && Files.exists(p.resolve("_current"))) out += fn
        else if (fn.endsWith(".view.sql")) out += fn.stripSuffix(".view.sql")
      }
      out.toSeq.sorted
    }

  /** Register one relation as a session temp view (SQL addressability). */
  def registerView(name: String): Unit =
    read(name).createOrReplaceTempView(name)

  /** Re-register everything (fresh session attach). Views can reference
    * other views, so retry failures until a fixpoint — each pass must
    * register at least one more relation or the leftovers are genuinely
    * broken (their upstream is gone) and get reported.
    */
  def attach(): Unit = {
    var pending = list()
    var progressing = true
    while (pending.nonEmpty && progressing) {
      val failed = pending.filter { n =>
        try { registerView(n); false }
        catch { case _: Exception => true }
      }
      progressing = failed.size < pending.size
      pending = failed
    }
    pending.foreach(n => System.err.println(s"[store] failed to attach $n"))
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val ds = Files.list(p).iterator()
      while (ds.hasNext) deleteRecursively(ds.next())
    }
    Files.deleteIfExists(p)
  }
}
