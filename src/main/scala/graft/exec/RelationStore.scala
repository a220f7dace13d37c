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
final class RelationStore(
    val spark: SparkSession,
    val root: String,
    val schema: String = "main",
    /** Register session views under `<schema>__<name>` instead of the
      * bare name — set for non-default schemas so same-named relations
      * in different schemas don't collide in the flat temp-view space.
      */
    val qualifyViews: Boolean = false,
    /** How many committed versions each table retains (≥ 1). Commits GC
      * beyond this automatically; [[read]]`(name, Some(v))` time-travels
      * within it and [[vacuum]] trims below it on demand. Production
      * analogue: lakehouse table retention for time travel.
      */
    val retainVersions: Int = 2,
    /** After how many live delta landings [[appendDelta]] folds the
      * deltas into a new base version (a metadata-only hard-link fold —
      * no data bytes are rewritten). Bounds the number of directories a
      * read has to list without ever making a tick's write cost
      * O(table).
      */
    val deltaFoldEvery: Int = 64) {
  private def schemaDir: Path = Paths.get(root, schema)
  private def tableDir(name: String): Path = schemaDir.resolve(name)
  private def pointer(name: String): Path = tableDir(name).resolve("_current")
  private def viewFile(name: String): Path = schemaDir.resolve(s"$name.view.sql")
  private def deltaRoot(name: String): Path = tableDir(name).resolve("delta")
  private def deltaDirOf(name: String, batchId: Long): Path =
    deltaRoot(name).resolve(s"b$batchId")

  def relation(name: String): Relation = Relation(schema, name)

  /** SQL-addressable session alias for a relation in this store. */
  def sqlName(name: String): String = if (qualifyViews) s"${schema}__$name" else name

  def exists(name: String): Boolean =
    Files.exists(pointer(name)) || Files.exists(viewFile(name)) ||
      liveDeltaIds(name).nonEmpty

  def isView(name: String): Boolean = Files.exists(viewFile(name))

  private def currentVersion(name: String): Option[Int] =
    if (Files.exists(pointer(name))) Some(Files.readString(pointer(name)).trim.toInt) else None

  def currentPath(name: String): Option[String] =
    currentVersion(name).map(v => tableDir(name).resolve(s"v$v").toString)

  def read(name: String): DataFrame = read(name, None)

  /** Read a table, optionally a PAST version (time travel). Versions
    * are immutable commit directories, so reading an old one is just a
    * scan of its path — the lakehouse time-travel model. Old versions
    * live until [[vacuum]] reclaims them.
    */
  def read(name: String, asOfVersion: Option[Int]): DataFrame = {
    if (isView(name)) {
      // a view has no versioned storage — silently returning current
      // data labeled as a past version would be wrong
      require(asOfVersion.isEmpty, s"$schema.$name is a view; views have no version history")
      spark.sql(Files.readString(viewFile(name)))
    }
    else if (isBucketed(name) && asOfVersion.isEmpty)
      // the catalog relation carries the bucket spec; a raw path read
      // would lose it and joins would re-shuffle
      spark.table(ensureBucketedRegistered(name))
    else {
      // time travel addresses BASE commits only; delta landings are
      // absorbed into the base by folds, not individually versioned
      val paths: Seq[String] = asOfVersion match {
        case Some(v) =>
          val cur = currentVersion(name).getOrElse(-1)
          val dir = tableDir(name).resolve(s"v$v")
          // v > cur means a torn directory from a crashed write, never
          // a committed version — reading it would scan partial files
          if (v > cur || !Files.exists(dir)) throw new IllegalStateException(
            s"version $v of $schema.$name not found (have: ${versions(name).filter(_ <= cur).mkString(",")})")
          Seq(dir.toString)
        case None =>
          val live = liveDeltaIds(name).map(id => deltaDirOf(name, id).toString)
          val all = currentPath(name).toSeq ++ live
          if (all.isEmpty)
            throw new IllegalStateException(s"relation not found: $schema.$name")
          all
      }
      val df = spark.read.parquet(paths: _*)
      // restore the exact written schema (column order + types): a
      // partitioned layout re-infers partition-column types on read,
      // which would otherwise drift (e.g. "2024-01-01" → DATE)
      val schemaFile = paths.map(p => Paths.get(p, "_graft_schema.json"))
        .find(Files.exists(_))
      schemaFile match {
        case Some(f) =>
          val stored = org.apache.spark.sql.types.DataType
            .fromJson(Files.readString(f))
            .asInstanceOf[org.apache.spark.sql.types.StructType]
          df.select(stored.fields.toSeq.map(f =>
            org.apache.spark.sql.functions.col(f.name).cast(f.dataType).as(f.name)): _*)
        case None => df
      }
    }
  }

  /** All version directories of a table, ascending — committed ones
    * are those ≤ the current pointer; anything above it is a torn
    * leftover from a crashed write (vacuum reclaims those).
    */
  def versions(name: String): Seq[Int] =
    if (!Files.exists(tableDir(name))) Nil
    else {
      val it = Files.list(tableDir(name)).iterator()
      val vs = scala.collection.mutable.ArrayBuffer[Int]()
      while (it.hasNext) {
        val f = it.next().getFileName.toString
        if (f.startsWith("v") && f.drop(1).forall(_.isDigit)) vs += f.drop(1).toInt
      }
      vs.toSeq.sorted
    }

  /** Retention: delete all version directories except the newest
    * `keepLast` (the current pointer target always survives — keepLast
    * is clamped to ≥ 1). Returns the number of versions reclaimed.
    * Old versions pin disk linearly in commit count; a production
    * deployment vacuums on a schedule exactly like lakehouse VACUUM.
    */
  def vacuum(name: String, keepLast: Int = 2): Int = {
    reapAbsorbedDeltas(name)
    val keep = math.max(1, keepLast)
    val cur = currentVersion(name).getOrElse(return 0)
    // anything above the pointer is a torn directory from a crashed
    // write — always garbage; retention counts committed versions only
    val (torn, committed) = versions(name).partition(_ > cur)
    val stale = committed.filter(_ < cur).sorted.reverse.drop(keep - 1)
    val candidates = torn ++ stale
    candidates.foreach(v => deleteRecursively(tableDir(name).resolve(s"v$v")))
    candidates.size
  }

  // ---- delta landing (streaming appends) ----
  //
  // A long-running ingest loop cannot afford the versioned full-rewrite
  // commit: appending one micro-batch by rewriting the whole table costs
  // O(landed history) per tick — quadratic cumulative I/O over the
  // stream's life. Instead each micro-batch lands as its OWN immutable
  // delta directory keyed by the foreachBatch batchId (a mini delta log
  // in the store's copy-on-write idiom):
  //
  //  - per-tick write cost is O(batch), never O(table);
  //  - landing is replay-idempotent: foreachBatch is at-least-once, and
  //    a replayed epoch finds its batchId already committed and skips —
  //    no double-append, and state derived FROM the landed table (e.g.
  //    streaming quota admission totals) stays exact across crashes;
  //  - commit is an atomic directory rename (write to a dot-tmp dir,
  //    move into place) — a crash mid-write leaves an invisible tmp dir
  //    that vacuum reclaims, never a torn committed delta.
  //
  // Every `deltaFoldEvery` landings the live deltas FOLD into a new base
  // version by hard-linking data files (metadata-only — zero data bytes
  // rewritten), bounding the directory count a read must list. The fold
  // records a `_delta_watermark` in the version dir: deltas with id ≤
  // watermark are absorbed (excluded from reads, reclaimed lazily), so
  // a crash between pointer-commit and delta-delete never double-counts.

  /** Batch ids of COMMITTED, not-yet-absorbed delta landings, ascending. */
  def landedBatchIds(name: String): Seq[Long] = liveDeltaIds(name)

  private def liveDeltaIds(name: String): Seq[Long] = {
    val d = deltaRoot(name)
    if (!Files.exists(d)) return Nil
    val wm = currentWatermark(name)
    val it = Files.list(d).iterator()
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    while (it.hasNext) {
      val f = it.next().getFileName.toString
      if (f.startsWith("b") && f.drop(1).forall(_.isDigit)) {
        val id = f.drop(1).toLong
        if (id > wm) out += id
      }
    }
    out.toSeq.sorted
  }

  /** Highest batch id absorbed into (or invalidated by) the current base
    * version; -1 when no base or the base predates any landing.
    */
  private def currentWatermark(name: String): Long =
    currentVersion(name).map { v =>
      val f = tableDir(name).resolve(s"v$v").resolve("_delta_watermark")
      if (Files.exists(f)) Files.readString(f).trim.toLong else -1L
    }.getOrElse(-1L)

  /** Whether `batchId` has already been durably landed (committed delta
    * dir, or absorbed below the base watermark). The replay guard:
    * Structured Streaming's foreachBatch is at-least-once, and batch ids
    * are monotone per checkpoint, so a replayed epoch answers true here
    * and [[appendDelta]] skips it.
    */
  def batchLanded(name: String, batchId: Long): Boolean =
    batchId <= currentWatermark(name) || Files.exists(deltaDirOf(name, batchId))

  /** Land one micro-batch as an immutable delta directory. Returns false
    * (and evaluates NOTHING — `df` stays lazy) when `batchId` already
    * landed. Refuses bucketed/partitioned-layout bases: deltas are flat
    * parquet dirs unioned into the read, which would silently discard a
    * bucket spec or partition columns.
    */
  def appendDelta(df: DataFrame, name: String, batchId: Long): Boolean = {
    // replay guard FIRST: an epoch that already landed must skip
    // quietly even if the table has since changed shape (e.g. a
    // bucketed CTAS superseded the landing loop) — crashing the stream
    // on a replayed old epoch would wedge recovery
    if (batchLanded(name, batchId)) return false
    require(!isView(name), s"cannot land deltas into view $schema.$name")
    require(!isBucketed(name),
      s"cannot land deltas into bucketed relation $schema.$name")
    require(currentVersion(name).isEmpty || !isPartitionedLayout(name),
      s"cannot land deltas into partitioned-layout relation $schema.$name")
    // same column names + types as the landed content — the read path
    // unions the dirs, so drift would surface as torn schemas later
    storedSchemaOf(name).foreach { stored =>
      val landed = stored.fields.toSeq.map(f => (f.name, f.dataType))
      val incoming = df.schema.fields.toSeq.map(f => (f.name, f.dataType))
      require(landed == incoming,
        s"appendDelta($name): schema drift — landed $landed vs incoming $incoming")
    }
    Files.createDirectories(deltaRoot(name))
    val tmp = deltaRoot(name).resolve(s".tmp_b$batchId")
    if (Files.exists(tmp)) deleteRecursively(tmp)
    df.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    Files.writeString(tmp.resolve("_graft_schema.json"), df.schema.json)
    Files.move(tmp, deltaDirOf(name, batchId), StandardCopyOption.ATOMIC_MOVE)
    registerView(name)
    if (liveDeltaIds(name).size >= math.max(2, deltaFoldEvery)) foldDeltas(name)
    true
  }

  /** Fold all live deltas into a new base version by HARD-LINKING their
    * data files (copy across filesystems) — a metadata-only commit:
    * bytes written per fold are O(file count), not O(table), so the
    * landing loop's cumulative I/O stays linear in data ingested. Delta
    * file names are prefixed `b{id}_` so links never collide across
    * folds. Returns the number of deltas folded.
    */
  def foldDeltas(name: String): Int = {
    reapAbsorbedDeltas(name) // leftovers of a crashed previous fold
    val live = liveDeltaIds(name)
    if (live.isEmpty) return 0
    val cur = currentVersion(name)
    val next = cur.getOrElse(-1) + 1
    val dest = tableDir(name).resolve(s"v$next")
    if (Files.exists(dest)) deleteRecursively(dest) // torn leftover
    Files.createDirectories(dest)
    cur.foreach { v =>
      val prev = tableDir(name).resolve(s"v$v")
      dataFilesIn(prev).foreach(f => linkFile(f, dest.resolve(f.getFileName.toString)))
    }
    live.foreach { id =>
      dataFilesIn(deltaDirOf(name, id)).foreach(f =>
        linkFile(f, dest.resolve(s"b${id}_${f.getFileName}")))
    }
    val schemaSrc = (cur.map(v => tableDir(name).resolve(s"v$v")).toSeq ++
      live.map(deltaDirOf(name, _)))
      .map(_.resolve("_graft_schema.json")).find(Files.exists(_))
    schemaSrc.foreach(s => Files.copy(s, dest.resolve("_graft_schema.json"),
      StandardCopyOption.REPLACE_EXISTING))
    Files.writeString(dest.resolve("_delta_watermark"), live.max.toString)
    commitPointer(name, next)
    reapAbsorbedDeltas(name)
    live.size
  }

  /** Reclaim absorbed delta dirs (id ≤ watermark) and crashed dot-tmp
    * landings. Linked data lives on in the base version's hard links.
    */
  private def reapAbsorbedDeltas(name: String): Unit = {
    val d = deltaRoot(name)
    if (!Files.exists(d)) return
    val wm = currentWatermark(name)
    val it = Files.list(d).iterator()
    val victims = scala.collection.mutable.ArrayBuffer[Path]()
    while (it.hasNext) {
      val p = it.next()
      val f = p.getFileName.toString
      if (f.startsWith(".tmp_")) victims += p
      else if (f.startsWith("b") && f.drop(1).forall(_.isDigit) && f.drop(1).toLong <= wm)
        victims += p
    }
    victims.foreach(deleteRecursively)
  }

  /** Data files (non-meta regular files) directly inside `dir`. */
  private def dataFilesIn(dir: Path): Seq[Path] = {
    if (!Files.isDirectory(dir)) return Nil
    val it = Files.list(dir).iterator()
    val out = scala.collection.mutable.ListBuffer[Path]()
    while (it.hasNext) {
      val c = it.next()
      val fn = c.getFileName.toString
      if (Files.isRegularFile(c) && !fn.startsWith("_") && !fn.startsWith(".")) out += c
    }
    out.toSeq
  }

  private def linkFile(src: Path, dest: Path): Unit =
    try Files.createLink(dest, src)
    catch { case _: UnsupportedOperationException | _: java.io.IOException =>
      Files.copy(src, dest, StandardCopyOption.COPY_ATTRIBUTES)
    }

  /** The stored schema of the current landed content (base version's, or
    * the oldest live delta's for a delta-only table).
    */
  private def storedSchemaOf(name: String): Option[org.apache.spark.sql.types.StructType] = {
    val candidates = currentPath(name).map(Paths.get(_)).toSeq ++
      liveDeltaIds(name).map(deltaDirOf(name, _))
    candidates.map(_.resolve("_graft_schema.json")).find(Files.exists(_)).map { f =>
      org.apache.spark.sql.types.DataType.fromJson(Files.readString(f))
        .asInstanceOf[org.apache.spark.sql.types.StructType]
    }
  }

  /** Write a new version and swap the pointer (the "commit").
    * `partitionBy` lays the version out as partitioned parquet dirs —
    * on a cluster that's what makes event-time `replaceWhere` windows
    * and partition-pruned scans O(touched partitions), not O(table).
    */
  def write(df: DataFrame, name: String, partitionBy: Seq[String] = Nil,
      /** Pre-commit validation over the WRITTEN files (constraint
        * checks): runs against a parquet read of the staged version —
        * a column-pruned scan, not a recompute of the model plan. A
        * throw leaves the previous version current.
        */
      validate: Option[DataFrame => Unit] = None,
      /** Exactly-once marker for merge-style streaming sinks: the batch
        * id this commit applies, persisted IN the version dir so the
        * marker and the data commit atomically together (pointer swap).
        * A replayed foreachBatch epoch checks [[lastBatchTag]] ≥ its id
        * and skips the non-idempotent merge.
        */
      batchTag: Option[Long] = None): Unit = {
    Files.createDirectories(tableDir(name))
    val next = currentVersion(name).getOrElse(-1) + 1
    val dest = tableDir(name).resolve(s"v$next")
    val writer = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
      .parquet(dest.toString)
    // leading "_" files are invisible to parquet FileIndex (like _SUCCESS)
    Files.writeString(dest.resolve("_graft_schema.json"), df.schema.json)
    // a full write REPLACES the table's content, so any live delta
    // landings are superseded — raise the watermark past them (they're
    // reclaimed post-commit; pre-commit they must stay: the pointer may
    // still end up naming the old version if validation throws)
    val supersededWm = (currentWatermark(name) +: liveDeltaIds(name): Seq[Long]).max
    if (supersededWm >= 0)
      Files.writeString(dest.resolve("_delta_watermark"), supersededWm.toString)
    batchTag.foreach(t => Files.writeString(dest.resolve("_graft_batch"), t.toString))
    validate.foreach { v =>
      try v(spark.read.parquet(dest.toString))
      catch { case e: Throwable => deleteRecursively(dest); throw e }
    }
    dropBucketing(name)
    commitPointer(name, next)
    reapAbsorbedDeltas(name)
  }

  /** Batch tag recorded by the current version's commit, if any. */
  def lastBatchTag(name: String): Option[Long] =
    currentVersion(name).flatMap { v =>
      val f = tableDir(name).resolve(s"v$v").resolve("_graft_batch")
      if (Files.exists(f)) Some(Files.readString(f).trim.toLong) else None
    }

  /** Bucketed CTAS (reference: warehouse clustering/bucketing DDL the
    * adapters render; Spark-side this is `CLUSTERED BY … INTO n BUCKETS`).
    * The version directory is identical to [[write]]'s, but the commit
    * ALSO records a session-catalog table whose metadata carries the
    * bucket spec — Spark only honors bucketing through the catalog, a
    * path read silently discards it. Two relations bucketed on the same
    * keys into the same bucket count join with ZERO Exchange (and zero
    * Sort, thanks to sortBy): at 100 TB that deletes the dominant
    * shuffle of every recurring fact-to-fact join on the bucket key.
    */
  def writeBucketed(df: DataFrame, name: String, bucketBy: Seq[String], buckets: Int): Unit = {
    require(bucketBy.nonEmpty && buckets > 0, "bucketed write needs keys and a bucket count")
    Files.createDirectories(tableDir(name))
    val next = currentVersion(name).getOrElse(-1) + 1
    val dest = tableDir(name).resolve(s"v$next")
    val cat = catalogName(name)
    // Stage through a scratch catalog name: the LIVE table (and the
    // pointer) stay intact until the data write has fully succeeded —
    // same failed-writes-never-corrupt discipline as write().
    val staging = cat + "__staging"
    spark.sql(s"DROP TABLE IF EXISTS $staging")
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketBy.head, bucketBy.tail: _*)
      .sortBy(bucketBy.head, bucketBy.tail: _*)
      .option("path", dest.toString)
      .saveAsTable(staging)
    Files.writeString(dest.resolve("_graft_schema.json"), df.schema.json)
    spark.sql(s"DROP TABLE IF EXISTS $staging") // metadata only (external)
    // a bucketed CTAS replaces the table's content wholly, exactly like
    // write(): any live delta landings are superseded via the watermark
    val supersededWm = (currentWatermark(name) +: liveDeltaIds(name): Seq[Long]).max
    if (supersededWm >= 0)
      Files.writeString(dest.resolve("_delta_watermark"), supersededWm.toString)
    // point of no return: data is durable at dest
    spark.sql(s"DROP TABLE IF EXISTS $cat")
    Files.writeString(bucketedFile(name), graft.artifacts.Json.write(Map(
      "catalog" -> cat, "bucket_by" -> bucketBy, "buckets" -> buckets)))
    registerCatalog(cat, dest, bucketBy, buckets)
    commitPointer(name, next)
    reapAbsorbedDeltas(name)
  }

  private def bucketedFile(name: String): Path = tableDir(name).resolve("_bucketed")

  def isBucketed(name: String): Boolean = Files.exists(bucketedFile(name))

  /** Catalog name + spec recorded by the last bucketed commit. */
  private def bucketSpec(name: String): (String, Seq[String], Int) =
    graft.artifacts.Json.parse(Files.readString(bucketedFile(name))) match {
      case m: Map[String @unchecked, Any @unchecked] =>
        (m("catalog").toString,
          m.getOrElse("bucket_by", Nil).asInstanceOf[Seq[Any]].map(String.valueOf(_)),
          m("buckets").toString.toDouble.toInt)
      // pre-JSON markers stored the bare catalog name
      case s => (String.valueOf(s), Nil, 0)
    }

  /** The session catalog is in-memory — a fresh JVM forgets the table
    * even though marker + files survive. Recreate the external bucketed
    * table over the current version on demand (CLUSTERED BY metadata;
    * the bucket ids live in the file names, so re-registration is pure
    * metadata).
    */
  private def ensureBucketedRegistered(name: String): String = {
    val (cat, keys, n) = bucketSpec(name)
    if (!spark.catalog.tableExists(cat)) {
      val p = currentPath(name).getOrElse(
        throw new IllegalStateException(s"bucketed relation without version: $schema.$name"))
      registerCatalog(cat, Paths.get(p), keys, n)
    }
    cat
  }

  private def registerCatalog(cat: String, dest: Path, keys: Seq[String], n: Int): Unit = {
    val stored = org.apache.spark.sql.types.DataType
      .fromJson(Files.readString(dest.resolve("_graft_schema.json")))
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val keyList = keys.mkString(", ")
    spark.sql(
      s"""CREATE TABLE IF NOT EXISTS $cat (${stored.toDDL}) USING parquet
         |CLUSTERED BY ($keyList) SORTED BY ($keyList) INTO $n BUCKETS
         |LOCATION '${dest.toString}'""".stripMargin)
  }

  /** A relation that stops being bucketed (config removed, or an
    * incremental path writes it) must not keep serving the stale
    * catalog table — clear marker + metadata before the new commit.
    */
  private def dropBucketing(name: String): Unit =
    if (isBucketed(name)) {
      spark.sql(s"DROP TABLE IF EXISTS ${bucketSpec(name)._1}")
      Files.delete(bucketedFile(name))
    }

  /** Session-catalog identifier for a bucketed relation — root-hashed so
    * stores over different warehouse dirs (parallel tests, defer stores)
    * never collide in the shared catalog.
    */
  private def catalogName(name: String): String = {
    val rootTag = java.security.MessageDigest.getInstance("MD5")
      .digest(root.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    s"graft_${rootTag}_${schema}__$name".replaceAll("[^A-Za-z0-9_]", "_")
  }

  /** Partition-scoped commit: `df` holds the FULL replacement content of
    * the partitions it touches (and nothing else); every leaf partition
    * directory of the current version that the write did not produce is
    * hard-linked into the new version unchanged. This is what makes
    * incremental strategies O(touched partitions) physically, not just
    * logically — a microbatch that lands in one day's partition commits
    * one partition's worth of bytes no matter how big the table is
    * (the lakehouse `replaceWhere` commit shape; on a cluster the links
    * become manifest entries referencing the previous version's files).
    *
    * Falls back to a full [[write]] when the table doesn't exist yet or
    * the schema changed (on_schema_change) — linked old files must share
    * the table schema or readers would see torn schemas.
    */
  def writePartitions(
      df: DataFrame,
      name: String,
      partitionBy: Seq[String],
      /** Explicit touched partition-value tuples. Required to DROP a
        * touched partition whose replacement content is empty (e.g. a
        * merged key moved out of it) — the parquet writer emits no dir
        * for zero rows, so written dirs alone under-report the touched
        * set. None ⇒ infer from the written dirs.
        */
      touchedValues: Option[Array[org.apache.spark.sql.Row]] = None): Unit = {
    require(partitionBy.nonEmpty, "writePartitions requires partition columns")
    // a partition-scoped commit replaces SOME content; live deltas are
    // neither partition-addressed nor superseded — the combination is
    // incoherent (delta landing targets flat append-only tables)
    require(liveDeltaIds(name).isEmpty,
      s"writePartitions($name): relation has live delta landings — fold or full-write first")
    val cur = currentVersion(name)
    if (cur.isEmpty) { write(df, name, partitionBy); return }
    val prev = tableDir(name).resolve(s"v${cur.get}")
    if (!schemaMatches(name, df.schema))
      // linked old files must share the table schema; callers guard with
      // schemaMatches and take the full-write path on on_schema_change
      throw new IllegalStateException(
        s"writePartitions($name): schema drift — use write() for schema-changing commits")
    val next = cur.get + 1
    val dest = tableDir(name).resolve(s"v$next")
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionBy: _*).parquet(dest.toString)
    Files.writeString(dest.resolve("_graft_schema.json"), df.schema.json)
    val dropped: Set[Path] = touchedValues match {
      case Some(vals) if vals.nonEmpty => touchedLeafDirs(df.schema, partitionBy, vals)
      case _ => Set.empty
    }
    // link every previous leaf dir that was neither re-written (present
    // in dest) nor touched-to-empty (in `dropped`)
    leafPartitionDirs(prev, partitionBy.length).foreach { rel =>
      val target = dest.resolve(rel)
      if (!Files.exists(target) && !dropped.contains(rel)) linkTree(prev.resolve(rel), target)
    }
    dropBucketing(name)
    commitPointer(name, next)
  }

  /** Escaped leaf-dir names for partition-value tuples, derived by
    * writing the tuples through Spark's own partitioned writer into a
    * scratch dir — value escaping/formatting is guaranteed to match the
    * data write (no hand-rolled Hive-path escaping to drift).
    */
  private def touchedLeafDirs(
      schema: org.apache.spark.sql.types.StructType,
      partitionBy: Seq[String],
      vals: Array[org.apache.spark.sql.Row]): Set[Path] = {
    import scala.jdk.CollectionConverters._
    val scratch = Files.createTempDirectory("graft_touched")
    val pf = org.apache.spark.sql.types.StructType(
      partitionBy.map(p => schema(p).copy(nullable = true)))
    spark.createDataFrame(vals.toSeq.asJava, pf)
      .withColumn("__one", org.apache.spark.sql.functions.lit(1))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).partitionBy(partitionBy: _*)
      .parquet(scratch.toString)
    val out = leafPartitionDirs(scratch, partitionBy.length).toSet
    deleteRecursively(scratch)
    out
  }

  /** Whether the current version is laid out as partitioned parquet —
    * the other precondition for a partition-scoped commit. A table
    * first written WITHOUT partition_by has no partition dirs to link,
    * so a partition-scoped commit against it would silently drop every
    * untouched row; callers must full-write once to re-layout.
    */
  def isPartitionedLayout(name: String): Boolean =
    currentPath(name).exists { p =>
      val d = Paths.get(p)
      Files.exists(d) && {
        val ds = Files.list(d).iterator()
        var found = false
        while (ds.hasNext && !found) {
          val c = ds.next()
          found = Files.isDirectory(c) && c.getFileName.toString.contains("=")
        }
        found
      }
    }

  /** Whether `schema` is byte-identical to the current version's stored
    * schema (the precondition for a partition-scoped commit).
    */
  def schemaMatches(name: String, schema: org.apache.spark.sql.types.StructType): Boolean =
    currentVersion(name).exists { v =>
      val f = tableDir(name).resolve(s"v$v").resolve("_graft_schema.json")
      Files.exists(f) && {
        val stored = org.apache.spark.sql.types.DataType
          .fromJson(Files.readString(f))
          .asInstanceOf[org.apache.spark.sql.types.StructType]
        // nullability is read-compatible either way (parquet fills nulls);
        // names + types + order are what linked files must agree on
        stored.fields.toSeq.map(x => (x.name, x.dataType)) ==
          schema.fields.toSeq.map(x => (x.name, x.dataType))
      }
    }

  /** Leaf partition dirs (depth = #partition cols) relative to `base`. */
  private def leafPartitionDirs(base: Path, depth: Int): Seq[Path] = {
    def walk(p: Path, d: Int): Seq[Path] =
      if (!Files.isDirectory(p)) Nil
      else if (d == 0) Seq(base.relativize(p))
      else {
        val ds = Files.list(p).iterator()
        val out = scala.collection.mutable.ListBuffer[Path]()
        while (ds.hasNext) {
          val c = ds.next()
          val fn = c.getFileName.toString
          if (Files.isDirectory(c) && fn.contains("=")) out ++= walk(c, d - 1)
        }
        out.toSeq
      }
    walk(base, depth)
  }

  /** Hard-link a directory tree (fall back to copy across filesystems). */
  private def linkTree(src: Path, dest: Path): Unit = {
    Files.createDirectories(dest.getParent)
    if (Files.isDirectory(src)) {
      Files.createDirectories(dest)
      val ds = Files.list(src).iterator()
      while (ds.hasNext) {
        val c = ds.next()
        linkTree(c, dest.resolve(c.getFileName))
      }
    } else {
      try Files.createLink(dest, src)
      catch { case _: UnsupportedOperationException | _: java.io.IOException =>
        Files.copy(src, dest, StandardCopyOption.COPY_ATTRIBUTES)
      }
    }
  }

  /** Selective small-file compaction — the lakehouse OPTIMIZE shape.
    *
    * Incremental commits write up to `spark.sql.shuffle.partitions`
    * task files into every touched partition; after enough microbatches
    * a 100 TB table's scan cost is dominated by file opens, not bytes.
    * This rewrites ONLY over-fragmented leaf partitions (more files
    * than `ceil(bytes / targetBytes)`) down to their ideal file count
    * and hard-links every well-sized partition unchanged into the new
    * version — O(fragmented partitions), not O(table), and a no-op
    * commit is skipped entirely.
    *
    * Bucketed relations are refused: their file names carry bucket ids
    * and coalescing would silently break the shuffle-free join contract.
    *
    * @return number of partitions rewritten (0 ⇒ no new version)
    */
  def compact(name: String, targetBytes: Long = 128L << 20): Int = {
    require(!isView(name), s"cannot compact view $schema.$name")
    require(!isBucketed(name),
      s"cannot compact bucketed relation $schema.$name — rewrite via its model instead")
    // a delta-landed table folds into a base version first: compaction
    // operates on (and only on) committed base layouts, and the fold is
    // metadata-only so this costs directory renames, not data bytes
    foldDeltas(name)
    val cur = currentVersion(name).getOrElse(
      throw new IllegalStateException(s"relation not found: $schema.$name"))
    val prev = tableDir(name).resolve(s"v$cur")
    val depth = partitionDepth(prev)
    val units: Seq[Path] =
      if (depth == 0) Seq(prev.relativize(prev)) else leafPartitionDirs(prev, depth)
    def dataFiles(dir: Path): Seq[Path] = {
      val ds = Files.list(dir).iterator()
      val out = scala.collection.mutable.ListBuffer[Path]()
      while (ds.hasNext) {
        val c = ds.next()
        val fn = c.getFileName.toString
        if (Files.isRegularFile(c) && fn.endsWith(".parquet") && !fn.startsWith("_")
          && !fn.startsWith(".")) out += c
      }
      out.toSeq
    }
    val fragmented = units.filter { rel =>
      val fs = dataFiles(prev.resolve(rel))
      val ideal = math.max(1L, (fs.map(Files.size).sum + targetBytes - 1) / targetBytes)
      fs.size > ideal
    }
    if (fragmented.isEmpty) return 0
    val next = cur + 1
    val dest = tableDir(name).resolve(s"v$next")
    val fragSet = fragmented.toSet
    for (rel <- fragmented) {
      val src = prev.resolve(rel)
      val fs = dataFiles(src)
      val ideal = math.max(1L, (fs.map(Files.size).sum + targetBytes - 1) / targetBytes)
      // leaf files exclude partition columns, so a per-leaf round-trip
      // preserves the written data schema exactly
      spark.read.parquet(src.toString).coalesce(ideal.toInt)
        .write.mode(SaveMode.Overwrite).parquet(dest.resolve(rel).toString)
    }
    for (rel <- units if !fragSet.contains(rel)) linkTree(prev.resolve(rel), dest.resolve(rel))
    // compaction rewrites the BASE only; carry the delta bookkeeping
    // forward unchanged (live deltas stay live, absorbed stay absorbed)
    Seq("_graft_schema.json", "_delta_watermark", "_graft_batch").foreach { meta =>
      val f = prev.resolve(meta)
      if (Files.exists(f))
        Files.copy(f, dest.resolve(meta), StandardCopyOption.REPLACE_EXISTING)
    }
    commitPointer(name, next)
    fragmented.size
  }

  /** Partition-dir nesting depth of a version layout (0 = unpartitioned),
    * inferred by walking the first `col=value` chain.
    */
  private def partitionDepth(base: Path): Int = {
    def firstEqDir(p: Path): Option[Path] = {
      val ds = Files.list(p).iterator()
      while (ds.hasNext) {
        val c = ds.next()
        if (Files.isDirectory(c) && c.getFileName.toString.contains("=")) return Some(c)
      }
      None
    }
    var d = 0
    var p = base
    var next = firstEqDir(p)
    while (next.isDefined) { d += 1; p = next.get; next = firstEqDir(p) }
    d
  }

  /** Atomic pointer swap + stale-version GC + session re-register. */
  private def commitPointer(name: String, next: Int): Unit = {
    val tmp = tableDir(name).resolve(s"_current.tmp$next")
    Files.writeString(tmp, next.toString)
    Files.move(tmp, pointer(name), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    // versions beyond the retention window are garbage; hard links keep
    // shared file data alive across version deletes.
    val keep = math.max(1, retainVersions)
    val stale = (0 to next - keep).map(v => tableDir(name).resolve(s"v$v")).filter(Files.exists(_))
    stale.foreach(deleteRecursively)
    registerView(name)
  }

  /** Store a logical view (SQL text) and register it in the session. */
  def writeView(name: String, sql: String): Unit = {
    Files.createDirectories(schemaDir)
    Files.writeString(viewFile(name), sql)
    spark.sql(sql).createOrReplaceTempView(sqlName(name))
  }

  def drop(name: String): Unit = {
    if (Files.exists(tableDir(name))) deleteRecursively(tableDir(name))
    Files.deleteIfExists(viewFile(name))
    Files.deleteIfExists(mvDefFile(name))
    Files.deleteIfExists(grantsFile(name))
    Files.deleteIfExists(commentsFile(name))
    spark.catalog.dropTempView(sqlName(name))
  }

  // ---- grants bookkeeping (reference: adapter apply_grants) ----

  private def grantsFile(name: String): Path = schemaDir.resolve(s"$name.grants.json")

  /** Record the FULL desired grant state for a relation (privilege →
    * grantee roles). Each write replaces the previous state — the
    * reference computes grant/revoke diffs against the warehouse; with
    * the store as the warehouse, replacing the recorded state is the
    * same semantics.
    */
  def writeGrants(name: String, grants: Map[String, Seq[String]]): Unit =
    if (grants.isEmpty) Files.deleteIfExists(grantsFile(name))
    else {
      Files.createDirectories(schemaDir)
      Files.writeString(grantsFile(name),
        graft.artifacts.Json.write(
          scala.collection.immutable.SortedMap.from(grants)))
    }

  // ---- persisted docs (reference config.py:86 persist_docs: relation/
  // column comments — the warehouse analogue is COMMENT ON / column
  // TBLPROPERTIES; with the store as the warehouse, the comment
  // metadata lives next to the relation and docs-generate reads it) ----

  private def commentsFile(name: String): Path = schemaDir.resolve(s"$name.comments.json")

  /** Record the FULL persisted-docs state for a relation: optional
    * relation comment + column → comment. Each write replaces the
    * previous state, so disabling persist_docs clears the comments on
    * the next run (same replace-the-desired-state semantics as grants).
    */
  def writeComments(name: String, relation: Option[String],
      columns: Map[String, String]): Unit =
    if (relation.isEmpty && columns.isEmpty) Files.deleteIfExists(commentsFile(name))
    else {
      Files.createDirectories(schemaDir)
      Files.writeString(commentsFile(name),
        graft.artifacts.Json.write(Map(
          "relation" -> relation.getOrElse(""),
          "columns" -> scala.collection.immutable.SortedMap.from(columns))))
    }

  /** (relation comment, column → comment) as persisted — empty when
    * the node never enabled persist_docs.
    */
  def comments(name: String): (Option[String], Map[String, String]) =
    if (!Files.exists(commentsFile(name))) (None, Map.empty)
    else graft.artifacts.Json.parse(Files.readString(commentsFile(name))) match {
      case m: Map[String @unchecked, Any @unchecked] =>
        val rel = m.get("relation").map(_.toString).filter(_.nonEmpty)
        val cols = m.get("columns") match {
          case Some(cm: Map[String @unchecked, Any @unchecked]) =>
            cm.map { case (k, v) => k -> v.toString }
          case _ => Map.empty[String, String]
        }
        (rel, cols)
      case _ => (None, Map.empty)
    }

  def grants(name: String): Map[String, Seq[String]] =
    if (!Files.exists(grantsFile(name))) Map.empty
    else graft.artifacts.Json.parse(Files.readString(grantsFile(name))) match {
      case m: Map[String @unchecked, Any @unchecked] => m.map {
        case (k, v: Seq[Any @unchecked]) => k -> v.map(_.toString)
        case (k, v) => k -> Seq(v.toString)
      }
      case _ => Map.empty
    }

  // ---- materialized-view definition bookkeeping ----

  private def mvDefFile(name: String): Path = schemaDir.resolve(s"$name.mv.sql")

  /** Record a materialized view's defining SQL alongside its table data
    * (the piece that distinguishes an MV from a plain table: the engine
    * can re-run the definition to refresh, and detect redefinition for
    * on_configuration_change).
    */
  def writeMvDefinition(name: String, sql: String): Unit = {
    Files.createDirectories(schemaDir)
    Files.writeString(mvDefFile(name), sql)
  }

  def mvDefinition(name: String): Option[String] =
    if (Files.exists(mvDefFile(name))) Some(Files.readString(mvDefFile(name))) else None

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
      val src = fromStore.addressable(name).getOrElse(
        throw new IllegalStateException(s"cannot clone missing relation $name"))
      // pointer-only clone: a view over the source's current version dir
      // (plus any live delta landings — addressable() unions them in)
      writeView(name, s"SELECT * FROM $src")
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
    else if (isBucketed(name)) Some(ensureBucketedRegistered(name))
    else {
      val live = liveDeltaIds(name).map(id => deltaDirOf(name, id).toString)
      (currentPath(name).toSeq ++ live) match {
        case Seq() => None
        case Seq(p) => Some(s"parquet.`$p`")
        case many => Some(many.map(p => s"SELECT * FROM parquet.`$p`")
          .mkString("(\n", "\nUNION ALL\n", "\n)"))
      }
    }

  def list(): Seq[String] =
    if (!Files.exists(schemaDir)) Nil
    else {
      val ds = Files.list(schemaDir).iterator()
      val out = scala.collection.mutable.ListBuffer[String]()
      while (ds.hasNext) {
        val p = ds.next()
        val fn = p.getFileName.toString
        if (Files.isDirectory(p) &&
          (Files.exists(p.resolve("_current")) || liveDeltaIds(fn).nonEmpty)) out += fn
        else if (fn.endsWith(".view.sql")) out += fn.stripSuffix(".view.sql")
      }
      out.toSeq.sorted
    }

  /** Register one relation as a session temp view (SQL addressability). */
  def registerView(name: String): Unit =
    read(name).createOrReplaceTempView(sqlName(name))

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
