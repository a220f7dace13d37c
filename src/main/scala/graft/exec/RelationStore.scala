package graft.exec

import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicLong

import org.apache.hadoop.fs.{FileContext, FileStatus, FileSystem, Options, Path => HPath}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.core.Relation

/** Versioned parquet relation store — the engine's warehouse.
  *
  * Every write creates a NEW immutable version and then atomically swaps
  * a pointer file, exactly the copy-on-write commit discipline lakehouse
  * table formats use. All I/O goes through the Hadoop `FileSystem` /
  * `FileContext` API, so the same store runs against `file://`, HDFS, or
  * an object store — the root's scheme picks the filesystem.
  *
  * A committed FLAT version is a MANIFEST (`_manifest.json` listing
  * table-relative data-file paths), not a directory of copies: data
  * files live where they were first written (a full write's own version
  * dir, or a streaming delta dir) and later versions reference them.
  * Consequences:
  *
  *  - a materialization can read the current version of its own target
  *    while writing the next (incremental merge = read + join + write,
  *    no read-overwrite conflict);
  *  - failed writes never corrupt the table (pointer still names the
  *    old version);
  *  - folding streaming deltas into a base version writes ZERO data
  *    bytes on ANY filesystem — the new version is one manifest file
  *    (no hard links, so no POSIX dependence and no copy fallback);
  *  - GC is reference-counted: a data file is reclaimable only when no
  *    retained version's manifest references it (lakehouse snapshot
  *    expiry semantics).
  *
  * PARTITIONED layouts are manifests too: each entry carries its leaf
  * partition key and size, and the read path is a [[ManifestFileIndex]]
  * scan (Spark's directory-based partition discovery refuses file
  * lists spanning version dirs — CONFLICTING_DIRECTORY_STRUCTURES —
  * so the index serves the typed partition values and the pruning
  * itself, the Delta/Iceberg read shape). A partition-scoped commit
  * therefore CARRIES untouched partitions by reference: zero data
  * bytes, zero hard links, on any filesystem. Reads also never list
  * directories or stat files — the manifest records sizes.
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
      * deltas into a new base version (a manifest-only commit — zero
      * data bytes written). Bounds the number of directories a read has
      * to list without ever making a tick's write cost O(table).
      */
    val deltaFoldEvery: Int = 64,
    /** Landing-loop auto-OPTIMIZE: when a fold leaves the table's
      * manifest with at least this many data files, [[compact]] runs
      * automatically, so a long-running ingest's file count stays
      * bounded without operator action. Bytes rewritten per compaction
      * are bounded by the under-sized files only (see [[compact]]).
      */
    val autoCompactMinFiles: Int = 512,
    /** Target data-file size for auto-compaction (files at or above it
      * are never rewritten).
      */
    val autoCompactTargetBytes: Long = 128L << 20) {

  // ---- filesystem layer (Hadoop FS — scheme-portable) ----

  private val hconf = spark.sessionState.newHadoopConf()
  // keep the caller's path form (a scheme-less root stays scheme-less in
  // currentPath/addressable strings); the filesystem is still resolved
  // from the root's scheme, so file://, hdfs://, s3a:// all work
  private val rootPath: HPath = new HPath(root)
  private val fs: FileSystem = rootPath.getFileSystem(hconf)
  // FileContext gives rename-with-OVERWRITE (the pointer swap); plain
  // FileSystem.rename refuses an existing destination on most schemes
  private lazy val fctx: FileContext = FileContext.getFileContext(fs.getUri, hconf)

  /** Cumulative data bytes rewritten by [[compact]] (manual or auto) —
    * lets specs pin that compaction cost is bounded by the fragmented
    * files, never the table.
    */
  val compactedBytes = new AtomicLong(0L)

  private def fsExists(p: HPath): Boolean = fs.exists(p)

  private def readStr(p: HPath): String = {
    val in = fs.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      new String(out.toByteArray, UTF_8)
    } finally in.close()
  }

  private def writeStr(p: HPath, s: String): Unit = {
    val parent = p.getParent
    if (parent != null && !fs.exists(parent)) fs.mkdirs(parent)
    val out = fs.create(p, true)
    try out.write(s.getBytes(UTF_8)) finally out.close()
  }

  /** Write-then-rename(OVERWRITE): the atomic pointer swap. */
  private def writeStrAtomic(p: HPath, s: String): Unit = {
    val tmp = new HPath(p.getParent, s".${p.getName}.tmp")
    writeStr(tmp, s)
    fctx.rename(tmp, p, Options.Rename.OVERWRITE)
  }

  private def listNames(dir: HPath): Seq[FileStatus] =
    if (!fs.exists(dir)) Nil else fs.listStatus(dir).toSeq

  private def deleteRec(p: HPath): Unit = if (fs.exists(p)) fs.delete(p, true)

  /** Data files (non-meta regular files) directly inside `dir`. */
  private def dataFilesIn(dir: HPath): Seq[FileStatus] =
    listNames(dir).filter { st =>
      val fn = st.getPath.getName
      st.isFile && !fn.startsWith("_") && !fn.startsWith(".")
    }

  /** Data files anywhere under `dir` (partitioned layouts nest). */
  private def dataFilesUnder(dir: HPath): Seq[FileStatus] =
    listNames(dir).flatMap { st =>
      val fn = st.getPath.getName
      if (st.isDirectory) dataFilesUnder(st.getPath)
      else if (!fn.startsWith("_") && !fn.startsWith(".")) Seq(st)
      else Nil
    }

  private def relTo(base: HPath, p: HPath): String = relToOn(fs, base, p)

  private def relToOn(onFs: FileSystem, base: HPath, p: HPath): String = {
    // listings return fully-qualified paths; the base may be scheme-less
    val b = onFs.makeQualified(base).toString + "/"
    val s = onFs.makeQualified(p).toString
    require(s.startsWith(b), s"$p not under $base")
    s.substring(b.length)
  }

  private def deleteIfEmptyTree(dir: HPath): Boolean = {
    if (!fs.exists(dir)) return true
    val children = listNames(dir)
    // a `_gutted` tombstone marks a fully-drained data pool — it must
    // not keep the (otherwise empty) dir alive forever, so it counts as
    // deletable; the final delete is recursive, sweeping the tombstone
    // plus any filesystem bookkeeping a checksum FS hides from listings
    // (.crc siblings)
    val allGone = children.forall { c =>
      if (c.isDirectory) deleteIfEmptyTree(c.getPath)
      else c.getPath.getName == "_gutted"
    }
    if (allGone) { fs.delete(dir, true); true } else false
  }

  // ---- layout ----

  private def schemaDir: HPath = new HPath(rootPath, schema)
  private def tableDir(name: String): HPath = new HPath(schemaDir, name)
  private def verDir(name: String, v: Int): HPath = new HPath(tableDir(name), s"v$v")
  private def pointer(name: String): HPath = new HPath(tableDir(name), "_current")
  private def viewFile(name: String): HPath = new HPath(schemaDir, s"$name.view.sql")
  private def deltaRoot(name: String): HPath = new HPath(tableDir(name), "delta")
  private def deltaDirOf(name: String, batchId: Long): HPath =
    new HPath(deltaRoot(name), s"b$batchId")

  def relation(name: String): Relation = Relation(schema, name)

  /** SQL-addressable session alias for a relation in this store. */
  def sqlName(name: String): String = if (qualifyViews) s"${schema}__$name" else name

  def exists(name: String): Boolean =
    fsExists(pointer(name)) || fsExists(viewFile(name)) || liveDeltaIds(name).nonEmpty

  def isView(name: String): Boolean = fsExists(viewFile(name))

  private def currentVersion(name: String): Option[Int] =
    if (fsExists(pointer(name))) Some(readStr(pointer(name)).trim.toInt) else None

  def currentPath(name: String): Option[String] =
    currentVersion(name).map(v => verDir(name, v).toString)

  // ---- manifests ----

  /** One manifest data file: table-relative path + recorded size (so
    * reads never stat the filesystem) + optional per-column min/max
    * stats (so selective scans skip whole files — [[FileStats]]).
    */
  private[exec] final case class MEntry(rel: String, size: Long,
      stats: Option[FileStats] = None) {
    def leafKey: String = ManifestFileIndex.leafKeyOf(rel)
  }

  /** A committed version's manifest. `layout`: "files" (flat),
    * "partitioned" (entries carry `col=value` leaf keys in their
    * paths), or "bucketed" (directory-self-contained; no entries
    * cross-reference into it).
    */
  private[exec] final case class VersionManifest(
      layout: String, partitionBy: Seq[String], entries: Seq[MEntry])

  private def manifestFile(name: String, v: Int): HPath =
    new HPath(verDir(name, v), "_manifest.json")

  private def hasManifest(name: String, v: Int): Boolean = fsExists(manifestFile(name, v))

  /** Whether version dir `v` reads as a COMMITTED version: a manifest
    * commit, or a LEGACY pre-manifest directory (data, no manifest, no
    * `_gutted` tombstone). A gutted dir — manifest expired, files kept
    * only because newer manifests reference them — is a data pool, not
    * a version.
    */
  private def isCommitted(name: String, v: Int): Boolean =
    hasManifest(name, v) ||
      (!fsExists(new HPath(verDir(name, v), "_gutted")) &&
        dataFilesUnder(verDir(name, v)).nonEmpty)

  private def manifestOf(name: String, v: Int): Option[VersionManifest] =
    if (!hasManifest(name, v)) None
    else graft.artifacts.Json.parse(readStr(manifestFile(name, v))) match {
      case m: Map[String @unchecked, Any @unchecked] =>
        val layout = m.getOrElse("layout", "files").toString
        val files = m.get("files") match {
          case Some(s: Seq[Any @unchecked]) => s.map(String.valueOf(_))
          case _ => Nil
        }
        val sizes = m.get("sizes") match {
          case Some(s: Seq[Any @unchecked]) => s.map(x => String.valueOf(x).toDouble.toLong)
          case _ => files.map(_ => -1L) // pre-size manifests: stat on demand
        }
        val pby = m.get("partition_by") match {
          case Some(s: Seq[Any @unchecked]) => s.map(String.valueOf(_))
          case _ => Nil
        }
        // per-file stats re-type against the version's stored schema;
        // pre-stats manifests (or a missing schema file) read as
        // stats-less entries — never skipped, always correct
        val stats: Seq[Option[FileStats]] = m.get("stats") match {
          case Some(s: Seq[Any @unchecked]) if s.nonEmpty =>
            val schemaFile = new HPath(verDir(name, v), "_graft_schema.json")
            if (!fsExists(schemaFile)) files.map(_ => None)
            else {
              val st = org.apache.spark.sql.types.DataType
                .fromJson(readStr(schemaFile)).asInstanceOf[StructType]
              s.map(x => if (x == null) None else FileStats.fromJsonValue(x, st))
            }
          case _ => files.map(_ => None)
        }
        Some(VersionManifest(layout, pby,
          files.lazyZip(sizes).lazyZip(stats).map {
            case (f, sz, fst) => MEntry(f, sz, fst)
          }.toSeq))
      case _ => None
    }

  private def writeManifest(name: String, v: Int, layout: String,
      partitionBy: Seq[String], entries: Seq[MEntry]): Unit =
    writeStr(manifestFile(name, v), graft.artifacts.Json.write(Map(
      "layout" -> layout,
      "partition_by" -> partitionBy,
      "files" -> entries.map(_.rel),
      "sizes" -> entries.map(_.size),
      "stats" -> entries.map(_.stats.map(FileStats.toJsonValue).orNull))))

  /** Physical data files under a version dir as manifest entries.
    * `statsSchema` turns on per-file column-stats collection — one
    * parquet FOOTER read per new file at commit time (metadata only),
    * which is what buys file-level data skipping on every later scan.
    */
  private def physicalEntries(name: String, v: Int,
      statsSchema: Option[StructType] = None): Seq[MEntry] =
    dataFilesUnder(verDir(name, v)).map { st =>
      MEntry(relTo(tableDir(name), st.getPath), st.getLen,
        statsSchema.flatMap(sc => FileStats.collect(st, sc, hconf)))
    }

  /** Data-file entries of version `v`: the manifest's for manifest
    * versions, the physical listing for legacy/bucketed dirs — either
    * way, the files a later version may carry by reference.
    */
  private def versionEntries(name: String, v: Int): Seq[MEntry] =
    manifestOf(name, v) match {
      case Some(m) if m.layout != "bucketed" => m.entries
      case _ => physicalEntries(name, v)
    }

  /** A manifest entry as a Hadoop FileStatus (no filesystem call —
    * the manifest recorded the size; pre-size manifests stat once).
    */
  private def entryStatus(name: String, e: MEntry): FileStatus = {
    val p = fs.makeQualified(new HPath(tableDir(name), e.rel))
    if (e.size >= 0)
      new FileStatus(e.size, false, 1, 128L << 20, 0L, p)
    else fs.getFileStatus(p)
  }

  // ---- reads ----

  def read(name: String): DataFrame = read(name, None)

  /** Read a table, optionally a PAST version (time travel). Versions are
    * immutable commits (manifests for flat tables), so reading an old
    * one is a scan of the files it references — the lakehouse
    * time-travel model. Old versions live until [[vacuum]] reclaims
    * them; reference-counted GC keeps every file a retained manifest
    * still names.
    */
  def read(name: String, asOfVersion: Option[Int]): DataFrame = {
    if (isView(name)) {
      // a view has no versioned storage — silently returning current
      // data labeled as a past version would be wrong
      require(asOfVersion.isEmpty, s"$schema.$name is a view; views have no version history")
      return spark.sql(readStr(viewFile(name)))
    }
    if (isBucketed(name) && asOfVersion.isEmpty)
      // the catalog relation carries the bucket spec; a raw path read
      // would lose it and joins would re-shuffle
      return spark.table(ensureBucketedRegistered(name))

    val cur = currentVersion(name)
    val (baseVer, live): (Option[Int], Seq[Long]) = asOfVersion match {
      case Some(v) =>
        // time travel addresses committed versions only: v ≤ pointer AND
        // manifest present (a dir above the pointer is a torn leftover
        // from a crashed write; one below without a manifest is a
        // GC-gutted data pool — both would scan partial content)
        if (v > cur.getOrElse(-1) || !isCommitted(name, v))
          throw new IllegalStateException(
            s"version $v of $schema.$name not found (have: " +
              s"${versions(name).filter(_ <= cur.getOrElse(-1)).mkString(",")})")
        (Some(v), Nil)
      case None =>
        val l = liveDeltaIds(name)
        if (cur.isEmpty && l.isEmpty)
          throw new IllegalStateException(s"relation not found: $schema.$name")
        (cur, l)
    }
    val schemaDirs = baseVer.map(verDir(name, _)).toSeq ++ live.map(deltaDirOf(name, _))
    val stored = schemaDirs.map(d => new HPath(d, "_graft_schema.json"))
      .find(fsExists).map { f =>
        org.apache.spark.sql.types.DataType.fromJson(readStr(f)).asInstanceOf[StructType]
      }
    // the base version scans through the manifest index: no directory
    // listing, no stat calls, and partition values/pruning served from
    // the manifest itself (legacy manifest-less dirs scan as paths)
    val base: Option[DataFrame] = baseVer.flatMap { v =>
      manifestOf(name, v) match {
        case Some(m) if m.layout == "files" || m.layout == "partitioned" =>
          if (m.entries.isEmpty) None
          else {
            val st = stored.getOrElse(throw new IllegalStateException(
              s"manifest version without stored schema: $schema.$name v$v"))
            val byLeaf = m.entries.groupBy(_.leafKey).toSeq.sortBy(_._1)
              .map { case (k, es) =>
                k -> es.map(e => (entryStatus(name, e), e.stats))
              }
            Some(ManifestFileIndex.datasetWithStatsFor(
              spark, fs.makeQualified(tableDir(name)), st, m.partitionBy, byLeaf))
          }
        case _ => Some(spark.read.parquet(verDir(name, v).toString))
      }
    }
    val deltas: Option[DataFrame] =
      if (live.isEmpty) None
      else {
        val reader = stored.fold(spark.read)(st => spark.read.schema(st))
        Some(reader.parquet(live.map(id => deltaDirOf(name, id).toString): _*))
      }
    val df = (base, deltas) match {
      case (Some(b), Some(d)) => b.unionByName(d)
      case (Some(b), None) => b
      case (None, Some(d)) => d
      case (None, None) =>
        // zero data files (empty table / empty epoch landings only):
        // an empty frame in the exact stored schema
        return spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](),
          stored.getOrElse(throw new IllegalStateException(
            s"relation $schema.$name has no data and no stored schema")))
    }
    // restore the exact written schema (column order + types): the
    // manifest index serves stored types already, so for manifest
    // versions the casts collapse to column reordering
    stored match {
      case Some(st) =>
        df.select(st.fields.toSeq.map(f =>
          org.apache.spark.sql.functions.col(f.name).cast(f.dataType).as(f.name)): _*)
      case None => df
    }
  }

  /** Version directories of a table, ascending: committed ones (those ≤
    * the current pointer, carrying a manifest) plus any torn leftover
    * above the pointer from a crashed write (vacuum reclaims those). A
    * gutted dir below the pointer — manifest expired, files retained
    * only because newer manifests still reference them — is a data
    * pool, not a version, and is not listed.
    */
  def versions(name: String): Seq[Int] = {
    val cur = currentVersion(name).getOrElse(-1)
    physicalVersionDirs(name).filter(v => v > cur || isCommitted(name, v)).sorted
  }

  private def physicalVersionDirs(name: String): Seq[Int] =
    listNames(tableDir(name)).flatMap { st =>
      val f = st.getPath.getName
      if (st.isDirectory && f.startsWith("v") && f.length > 1 && f.drop(1).forall(_.isDigit))
        Some(f.drop(1).toInt)
      else None
    }

  /** Retention: expire all committed versions except the newest
    * `keepLast` (the current pointer target always survives — keepLast
    * is clamped to ≥ 1), plus torn dirs above the pointer. Returns the
    * number of versions reclaimed. Reference-counted: a DATA FILE is
    * deleted only when no retained manifest references it, so expiring
    * a full-write version whose files later folds still name reclaims
    * the metadata now and the bytes when the last referencing manifest
    * expires — exactly lakehouse snapshot expiry.
    */
  def vacuum(name: String, keepLast: Int = 2): Int = gcTable(name, math.max(1, keepLast))

  private def gcTable(name: String, keep: Int): Int = {
    val td = tableDir(name)
    if (!fsExists(td)) return 0
    val curOpt = currentVersion(name)
    // always reap crashed dot-tmp landings
    listNames(deltaRoot(name)).foreach { st =>
      if (st.getPath.getName.startsWith(".tmp_")) deleteRec(st.getPath)
    }
    val cur = curOpt.getOrElse(return 0)
    val all = physicalVersionDirs(name)
    val committed = all.filter(v => v <= cur && isCommitted(name, v)).sorted
    val retained = committed.takeRight(math.max(1, keep)).toSet
    val referenced: Set[String] =
      retained.flatMap(v => manifestOf(name, v) match {
        // bucketed versions are directory-self-contained; nothing
        // cross-references into them
        case Some(m) if m.layout != "bucketed" => m.entries.map(_.rel)
        case _ => Nil
      })
    var reclaimed = 0
    for (v <- all if !retained.contains(v)) {
      val dir = verDir(name, v)
      // torn (> pointer) and expired-committed dirs both count as
      // reclaimed versions; an already-gutted data pool does not
      val wasVersion = v > cur || isCommitted(name, v)
      // crash-safe gut ordering: tombstone FIRST, then metadata, then
      // data. Every crash window then reads as either a still-committed
      // version (manifest intact, nothing deleted yet) or a cleanly
      // refused gutted pool — never a manifest-less dir with partial
      // data that isCommitted() would mistake for a LEGACY version.
      // (The tombstone is also what tells an expired version apart from
      // a LEGACY pre-manifest committed dir, which must keep reading as
      // a version; deleteIfEmptyTree sweeps it once the pool drains.)
      if (fsExists(dir) && !fsExists(new HPath(dir, "_gutted")))
        writeStr(new HPath(dir, "_gutted"), "")
      Seq("_manifest.json", "_graft_schema.json", "_delta_watermark", "_graft_batch",
        "_SUCCESS").foreach(m => fs.delete(new HPath(dir, m), false))
      dataFilesUnder(dir).foreach { st =>
        if (!referenced.contains(relTo(td, st.getPath))) fs.delete(st.getPath, false)
      }
      deleteIfEmptyTree(dir)
      if (wasVersion) reclaimed += 1
    }
    // absorbed deltas (id ≤ watermark) are reclaimable only when no
    // retained manifest references a file inside them
    val wm = currentWatermark(name)
    listNames(deltaRoot(name)).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith("b") && n.drop(1).forall(_.isDigit) && n.drop(1).toLong <= wm &&
        !referenced.exists(_.startsWith(s"delta/$n/")))
        deleteRec(st.getPath)
    }
    reclaimed
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
  //    that GC reclaims, never a torn committed delta.
  //
  // Every `deltaFoldEvery` landings the live deltas FOLD into a new base
  // version: ONE manifest file naming the previous base's entries plus
  // the delta files — zero data bytes written, on any filesystem. The
  // fold records a `_delta_watermark` in the version dir: deltas with
  // id ≤ watermark are absorbed (excluded from reads, reclaimed when no
  // retained manifest references them), so a crash between
  // pointer-commit and delta-reap never double-counts.

  /** Batch ids of COMMITTED, not-yet-absorbed delta landings, ascending. */
  def landedBatchIds(name: String): Seq[Long] = liveDeltaIds(name)

  private def liveDeltaIds(name: String): Seq[Long] = {
    val wm = currentWatermark(name)
    listNames(deltaRoot(name)).flatMap { st =>
      val f = st.getPath.getName
      if (f.startsWith("b") && f.drop(1).forall(_.isDigit) && f.drop(1).toLong > wm)
        Some(f.drop(1).toLong)
      else None
    }.sorted
  }

  /** Highest batch id absorbed into (or invalidated by) the current base
    * version; -1 when no base or the base predates any landing.
    */
  private def currentWatermark(name: String): Long =
    currentVersion(name).map { v =>
      val f = new HPath(verDir(name, v), "_delta_watermark")
      if (fsExists(f)) readStr(f).trim.toLong else -1L
    }.getOrElse(-1L)

  /** Whether `batchId` has already been durably landed (committed delta
    * dir, or absorbed below the base watermark). The replay guard:
    * Structured Streaming's foreachBatch is at-least-once, and batch ids
    * are monotone per checkpoint, so a replayed epoch answers true here
    * and [[appendDelta]] skips it.
    */
  def batchLanded(name: String, batchId: Long): Boolean =
    batchId <= currentWatermark(name) || fsExists(deltaDirOf(name, batchId))

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
    // unions the files, so drift would surface as torn schemas later
    storedSchemaOf(name).foreach { stored =>
      val landed = stored.fields.toSeq.map(f => (f.name, f.dataType))
      val incoming = df.schema.fields.toSeq.map(f => (f.name, f.dataType))
      require(landed == incoming,
        s"appendDelta($name): schema drift — landed $landed vs incoming $incoming")
    }
    fs.mkdirs(deltaRoot(name))
    val tmp = new HPath(deltaRoot(name), s".tmp_b$batchId")
    deleteRec(tmp)
    df.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    writeStr(new HPath(tmp, "_graft_schema.json"), df.schema.json)
    fctx.rename(tmp, deltaDirOf(name, batchId))
    registerView(name)
    if (liveDeltaIds(name).size >= math.max(2, deltaFoldEvery)) {
      foldDeltas(name)
      // landing-loop auto-OPTIMIZE: bound the file count a scan opens
      // without operator action; rewrites only under-sized files
      if (versionEntries(name, currentVersion(name).get).size >= autoCompactMinFiles)
        compact(name, autoCompactTargetBytes)
    }
    true
  }

  /** Fold all live deltas into a new base version — ONE manifest file
    * naming the previous base's entries plus the live deltas' data
    * files. Zero data bytes are written, on any filesystem: the fold is
    * O(1) data, O(live deltas) metadata. Returns the number of deltas
    * folded.
    */
  def foldDeltas(name: String): Int = {
    val live = liveDeltaIds(name)
    if (live.isEmpty) return 0
    val cur = currentVersion(name)
    val next = cur.getOrElse(-1) + 1
    val dest = verDir(name, next)
    deleteRec(dest) // torn leftover of a crashed previous fold
    fs.mkdirs(dest)
    val prevEntries = cur.toSeq.flatMap(v => versionEntries(name, v))
    val schemaSrc = (cur.map(verDir(name, _)).toSeq ++ live.map(deltaDirOf(name, _)))
      .map(d => new HPath(d, "_graft_schema.json")).find(fsExists)
    val foldSchema = schemaSrc.map(s =>
      org.apache.spark.sql.types.DataType.fromJson(readStr(s)).asInstanceOf[StructType])
    // delta files gain their column stats HERE (one footer read each,
    // once per file's lifetime) — the fold still writes zero data bytes
    val deltaEntries = live.flatMap { id =>
      dataFilesIn(deltaDirOf(name, id)).map { st =>
        MEntry(relTo(tableDir(name), st.getPath), st.getLen,
          foldSchema.flatMap(sc => FileStats.collect(st, sc, hconf)))
      }
    }
    writeManifest(name, next, "files", Nil, prevEntries ++ deltaEntries)
    schemaSrc.foreach(s => writeStr(new HPath(dest, "_graft_schema.json"), readStr(s)))
    writeStr(new HPath(dest, "_delta_watermark"), live.max.toString)
    commitPointer(name, next)
    live.size
  }

  /** The stored schema of the current landed content (base version's, or
    * the oldest live delta's for a delta-only table).
    */
  private def storedSchemaOf(name: String): Option[StructType] = {
    val candidates = currentVersion(name).map(verDir(name, _)).toSeq ++
      liveDeltaIds(name).map(deltaDirOf(name, _))
    candidates.map(d => new HPath(d, "_graft_schema.json")).find(fsExists).map { f =>
      org.apache.spark.sql.types.DataType.fromJson(readStr(f)).asInstanceOf[StructType]
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
    fs.mkdirs(tableDir(name))
    val next = currentVersion(name).getOrElse(-1) + 1
    val dest = verDir(name, next)
    val writer = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
      .parquet(dest.toString)
    // leading "_" files are invisible to parquet FileIndex (like _SUCCESS)
    writeStr(new HPath(dest, "_graft_schema.json"), df.schema.json)
    val entries = physicalEntries(name, next, statsSchema = Some(df.schema))
    if (partitionBy.nonEmpty)
      writeManifest(name, next, "partitioned", partitionBy, entries)
    else writeManifest(name, next, "files", Nil, entries)
    // a full write REPLACES the table's content, so any live delta
    // landings are superseded — raise the watermark past them (they're
    // reclaimed post-commit; pre-commit they must stay: the pointer may
    // still end up naming the old version if validation throws)
    val supersededWm = (currentWatermark(name) +: liveDeltaIds(name): Seq[Long]).max
    if (supersededWm >= 0)
      writeStr(new HPath(dest, "_delta_watermark"), supersededWm.toString)
    batchTag.foreach(t => writeStr(new HPath(dest, "_graft_batch"), t.toString))
    validate.foreach { v =>
      try v(spark.read.parquet(dest.toString))
      catch { case e: Throwable => deleteRec(dest); throw e }
    }
    dropBucketing(name)
    commitPointer(name, next)
  }

  /** Batch tag recorded by the current version's commit, if any. */
  def lastBatchTag(name: String): Option[Long] =
    currentVersion(name).flatMap { v =>
      val f = new HPath(verDir(name, v), "_graft_batch")
      if (fsExists(f)) Some(readStr(f).trim.toLong) else None
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
    fs.mkdirs(tableDir(name))
    val next = currentVersion(name).getOrElse(-1) + 1
    val dest = verDir(name, next)
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
    writeStr(new HPath(dest, "_graft_schema.json"), df.schema.json)
    writeManifest(name, next, "bucketed", Nil, Nil)
    spark.sql(s"DROP TABLE IF EXISTS $staging") // metadata only (external)
    // a bucketed CTAS replaces the table's content wholly, exactly like
    // write(): any live delta landings are superseded via the watermark
    val supersededWm = (currentWatermark(name) +: liveDeltaIds(name): Seq[Long]).max
    if (supersededWm >= 0)
      writeStr(new HPath(dest, "_delta_watermark"), supersededWm.toString)
    // point of no return: data is durable at dest
    spark.sql(s"DROP TABLE IF EXISTS $cat")
    writeStr(bucketedFile(name), graft.artifacts.Json.write(Map(
      "catalog" -> cat, "bucket_by" -> bucketBy, "buckets" -> buckets)))
    registerCatalog(cat, dest, bucketBy, buckets)
    commitPointer(name, next)
  }

  private def bucketedFile(name: String): HPath = new HPath(tableDir(name), "_bucketed")

  def isBucketed(name: String): Boolean = fsExists(bucketedFile(name))

  /** Catalog name + spec recorded by the last bucketed commit. */
  private def bucketSpec(name: String): (String, Seq[String], Int) =
    graft.artifacts.Json.parse(readStr(bucketedFile(name))) match {
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
      registerCatalog(cat, new HPath(p), keys, n)
    }
    cat
  }

  private def registerCatalog(cat: String, dest: HPath, keys: Seq[String], n: Int): Unit = {
    val stored = org.apache.spark.sql.types.DataType
      .fromJson(readStr(new HPath(dest, "_graft_schema.json")))
      .asInstanceOf[StructType]
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
      fs.delete(bucketedFile(name), false)
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
    * of the current version that the write did not produce is CARRIED
    * into the new version's manifest by reference — zero data bytes, on
    * any filesystem. This is what makes incremental strategies
    * O(touched partitions) physically, not just logically — a
    * microbatch that lands in one day's partition commits one
    * partition's worth of bytes no matter how big the table is (the
    * lakehouse `replaceWhere` commit shape, with the manifest playing
    * the delta-log role).
    *
    * Falls back to a full [[write]] when the table doesn't exist yet or
    * the schema changed (on_schema_change) — carried old files must
    * share the table schema or readers would see torn schemas.
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
    if (!schemaMatches(name, df.schema))
      // carried old files must share the table schema; callers guard
      // with schemaMatches and take the full-write path on
      // on_schema_change
      throw new IllegalStateException(
        s"writePartitions($name): schema drift — use write() for schema-changing commits")
    val next = cur.get + 1
    val dest = verDir(name, next)
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionBy: _*).parquet(dest.toString)
    writeStr(new HPath(dest, "_graft_schema.json"), df.schema.json)
    val dropped: Set[String] = touchedValues match {
      case Some(vals) if vals.nonEmpty => touchedLeafDirs(df.schema, partitionBy, vals)
      case _ => Set.empty
    }
    // carry every previous entry whose leaf was neither re-written
    // (present among the new physical files) nor touched-to-empty
    val newEntries = physicalEntries(name, next, statsSchema = Some(df.schema))
    val written = newEntries.map(_.leafKey).toSet
    val carried = versionEntries(name, cur.get)
      .filter(e => !written.contains(e.leafKey) && !dropped.contains(e.leafKey))
    writeManifest(name, next, "partitioned", partitionBy, newEntries ++ carried)
    dropBucketing(name)
    commitPointer(name, next)
  }

  /** Escaped leaf-dir names for partition-value tuples, derived by
    * writing the tuples through Spark's own partitioned writer into a
    * DRIVER-LOCAL scratch dir — value escaping/formatting is guaranteed
    * to match the data write (no hand-rolled Hive-path escaping to
    * drift).
    */
  private def touchedLeafDirs(
      schema: StructType,
      partitionBy: Seq[String],
      vals: Array[org.apache.spark.sql.Row]): Set[String] = {
    import scala.jdk.CollectionConverters._
    val scratch = java.nio.file.Files.createTempDirectory("graft_touched")
    val pf = StructType(partitionBy.map(p => schema(p).copy(nullable = true)))
    // write through an explicit file: URI — a scheme-less path would
    // resolve against fs.defaultFS (HDFS/object store on a cluster)
    // while the read-back below is pinned to the local FS; the silent
    // empty listing would carry touched-to-empty partitions forward
    spark.createDataFrame(vals.toSeq.asJava, pf)
      .withColumn("__one", org.apache.spark.sql.functions.lit(1))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).partitionBy(partitionBy: _*)
      .parquet(scratch.toUri.toString)
    val local = FileSystem.getLocal(hconf)
    val base = local.makeQualified(new HPath(scratch.toString))
    val out = leafPartitionDirsOn(local, base, base, partitionBy.length).toSet
    local.delete(base, true)
    require(vals.isEmpty || out.nonEmpty,
      s"touched-partition derivation listed no leaf dirs for ${vals.length} tuples — " +
        "scratch write and read-back disagree on the filesystem")
    out
  }

  /** Whether the current version is laid out as partitioned parquet —
    * the other precondition for a partition-scoped commit. A table
    * first written WITHOUT partition_by has no partition dirs to carry,
    * so a partition-scoped commit against it would silently drop every
    * untouched row; callers must full-write once to re-layout.
    */
  def isPartitionedLayout(name: String): Boolean =
    currentVersion(name).exists { v =>
      manifestOf(name, v) match {
        case Some(m) => m.layout == "partitioned"
        case None => // legacy manifest-less dir: physical check
          listNames(verDir(name, v)).exists(st =>
            st.isDirectory && st.getPath.getName.contains("="))
      }
    }

  /** Whether `schema` is byte-identical to the current version's stored
    * schema (the precondition for a partition-scoped commit).
    */
  def schemaMatches(name: String, schema: StructType): Boolean =
    currentVersion(name).exists { v =>
      val f = new HPath(verDir(name, v), "_graft_schema.json")
      fsExists(f) && {
        val stored = org.apache.spark.sql.types.DataType
          .fromJson(readStr(f)).asInstanceOf[StructType]
        // nullability is read-compatible either way (parquet fills nulls);
        // names + types + order are what carried files must agree on
        stored.fields.toSeq.map(x => (x.name, x.dataType)) ==
          schema.fields.toSeq.map(x => (x.name, x.dataType))
      }
    }

  /** Leaf partition dirs (depth = #partition cols) relative to `base`,
    * as '/'-joined `col=value` strings — used only on the DRIVER-LOCAL
    * scratch dir that derives escaped leaf names for touched-partition
    * tuples; store versions are enumerated via manifests.
    */
  private def leafPartitionDirsOn(
      onFs: FileSystem, base: HPath, p: HPath, depth: Int): Seq[String] =
    if (!onFs.exists(p) || !onFs.getFileStatus(p).isDirectory) Nil
    else if (depth == 0) Seq(relToOn(onFs, base, p))
    else onFs.listStatus(p).toSeq.flatMap { st =>
      if (st.isDirectory && st.getPath.getName.contains("="))
        leafPartitionDirsOn(onFs, base, st.getPath, depth - 1)
      else Nil
    }

  /** Selective small-file compaction — the lakehouse OPTIMIZE shape.
    *
    * Incremental commits write up to `spark.sql.shuffle.partitions`
    * task files into every touched partition; after enough microbatches
    * a 100 TB table's scan cost is dominated by file opens, not bytes.
    *
    * FLAT (manifest) layouts binpack: manifest entries smaller than
    * `targetBytes` are rewritten into ideally-sized files; entries at or
    * above it carry over as manifest references untouched — bytes
    * rewritten are bounded by the under-sized files, never the table,
    * and [[compactedBytes]] exposes the running total. PARTITIONED
    * layouts rewrite ONLY over-fragmented leaf partitions (more files
    * than `ceil(bytes / targetBytes)`) and carry every well-sized
    * partition unchanged — O(fragmented partitions), not O(table). A
    * no-op compaction commits nothing.
    *
    * Bucketed relations are refused: their file names carry bucket ids
    * and coalescing would silently break the shuffle-free join contract.
    *
    * @return number of partitions rewritten (0 ⇒ no new version;
    *         flat layouts count as one partition)
    */
  def compact(name: String, targetBytes: Long = 128L << 20): Int = {
    require(!isView(name), s"cannot compact view $schema.$name")
    require(!isBucketed(name),
      s"cannot compact bucketed relation $schema.$name — rewrite via its model instead")
    // a delta-landed table folds into a base version first: compaction
    // operates on (and only on) committed base layouts, and the fold is
    // manifest-only so this costs one metadata file, not data bytes
    foldDeltas(name)
    val cur = currentVersion(name).getOrElse(
      throw new IllegalStateException(s"relation not found: $schema.$name"))
    val m = manifestOf(name, cur)
    val entries = versionEntries(name, cur)
    val partitioned = m.exists(_.layout == "partitioned") ||
      (m.isEmpty && entries.exists(_.leafKey.nonEmpty)) // legacy dir
    if (partitioned) {
      val pby = m.map(_.partitionBy).filter(_.nonEmpty).getOrElse(
        // legacy manifests/dirs: derive the partition columns from a
        // leaf key's `col=` names (order preserved by the path)
        entries.head.leafKey.split('/').toSeq.map(_.takeWhile(_ != '=')))
      compactPartitioned(name, cur, pby, entries, targetBytes)
    } else compactFlat(name, cur, entries, targetBytes)
  }

  private def compactFlat(
      name: String, cur: Int, entries: Seq[MEntry], targetBytes: Long): Int = {
    val td = tableDir(name)
    val sized = entries.map(e =>
      if (e.size >= 0) e
      else e.copy(size = fs.getFileStatus(new HPath(td, e.rel)).getLen))
    // small-file cutoff at HALF the target (the Delta OPTIMIZE
    // convention): coalesce outputs average just UNDER targetBytes, so
    // classifying by `< targetBytes` would re-rewrite prior compaction
    // outputs on every trigger — O(table) per trigger instead of
    // amortizing. Files in [target/2, target) are good enough to keep.
    val smallCutoff = math.max(1L, targetBytes / 2)
    val (small, big) = sized.partition(_.size < smallCutoff)
    val smallBytes = small.map(_.size).sum
    val ideal = math.max(1L, (smallBytes + targetBytes - 1) / targetBytes)
    if (small.size <= ideal) return 0
    val next = cur + 1
    val dest = verDir(name, next)
    deleteRec(dest)
    val packed = spark.read.parquet(small.map(e => new HPath(td, e.rel).toString): _*)
    // Z-order-lite: cluster the rewrite by the leading indexed column so
    // each output file covers a NARROW value range — data skipping gets
    // sharper as the table ages instead of degrading (shuffle cost is
    // bounded by the under-sized files being rewritten anyway)
    val clustered = clusterBy(packed, ideal.toInt)
    clustered.write.mode(SaveMode.Overwrite).parquet(dest.toString)
    compactedBytes.addAndGet(smallBytes)
    writeManifest(name, next, "files", Nil,
      big ++ physicalEntries(name, next, statsSchema = storedSchemaOf(name)))
    carryVersionMeta(name, cur, next)
    commitPointer(name, next)
    1
  }

  /** Cluster a compaction rewrite by its leading stats-indexed column:
    * range-partition into `n` outputs (each covering a disjoint value
    * range) and sort inside each, so both file-level min/max skipping
    * and parquet row-group pruning stay selective. No indexed column ⇒
    * plain coalesce.
    */
  private def clusterBy(df: DataFrame, n: Int): DataFrame =
    FileStats.indexedColumns(df.schema).headOption match {
      case Some(f) =>
        val c = org.apache.spark.sql.functions.col(f.name)
        if (n > 1) df.repartitionByRange(n, c).sortWithinPartitions(c)
        else df.coalesce(1).sortWithinPartitions(c)
      case None => df.coalesce(n)
    }

  private def compactPartitioned(name: String, cur: Int, partitionBy: Seq[String],
      entries: Seq[MEntry], targetBytes: Long): Int = {
    val td = tableDir(name)
    val sized = entries.map(e =>
      if (e.size >= 0) e
      else e.copy(size = fs.getFileStatus(new HPath(td, e.rel)).getLen))
    val byLeaf = sized.groupBy(_.leafKey)
    val fragmented = byLeaf.filter { case (_, es) =>
      val ideal = math.max(1L, (es.map(_.size).sum + targetBytes - 1) / targetBytes)
      es.size > ideal
    }
    if (fragmented.isEmpty) return 0
    val next = cur + 1
    val dest = verDir(name, next)
    deleteRec(dest)
    for ((leaf, es) <- fragmented.toSeq.sortBy(_._1)) {
      val bytes = es.map(_.size).sum
      val ideal = math.max(1L, (bytes + targetBytes - 1) / targetBytes)
      // leaf files exclude partition columns, so a per-leaf round-trip
      // preserves the written data schema exactly; the rewritten files
      // land under the SAME `col=value` leaf path in the new version
      clusterBy(spark.read.parquet(es.map(e => new HPath(td, e.rel).toString): _*),
        ideal.toInt)
        .write.mode(SaveMode.Overwrite).parquet(new HPath(dest, leaf).toString)
      compactedBytes.addAndGet(bytes)
    }
    // well-sized leaves carry by reference, fragmented ones re-list
    val carried = sized.filterNot(e => fragmented.contains(e.leafKey))
    writeManifest(name, next, "partitioned", partitionBy,
      physicalEntries(name, next, statsSchema = storedSchemaOf(name)) ++ carried)
    carryVersionMeta(name, cur, next)
    commitPointer(name, next)
    fragmented.size
  }

  /** Compaction rewrites the BASE only; carry the delta bookkeeping
    * forward unchanged (live deltas stay live, absorbed stay absorbed).
    */
  private def carryVersionMeta(name: String, from: Int, to: Int): Unit =
    Seq("_graft_schema.json", "_delta_watermark", "_graft_batch").foreach { meta =>
      val f = new HPath(verDir(name, from), meta)
      if (fsExists(f)) writeStr(new HPath(verDir(name, to), meta), readStr(f))
    }

  /** Atomic pointer swap + reference-counted GC + session re-register. */
  private def commitPointer(name: String, next: Int): Unit = {
    writeStrAtomic(pointer(name), next.toString)
    gcTable(name, retainVersions)
    registerView(name)
  }

  /** Store a logical view (SQL text) and register it in the session. */
  def writeView(name: String, sql: String): Unit = {
    fs.mkdirs(schemaDir)
    writeStr(viewFile(name), sql)
    spark.sql(sql).createOrReplaceTempView(sqlName(name))
  }

  def drop(name: String): Unit = {
    deleteRec(tableDir(name))
    fs.delete(viewFile(name), false)
    fs.delete(mvDefFile(name), false)
    fs.delete(grantsFile(name), false)
    fs.delete(commentsFile(name), false)
    spark.catalog.dropTempView(sqlName(name))
  }

  // ---- grants bookkeeping (reference: adapter apply_grants) ----

  private def grantsFile(name: String): HPath = new HPath(schemaDir, s"$name.grants.json")

  /** Record the FULL desired grant state for a relation (privilege →
    * grantee roles). Each write replaces the previous state — the
    * reference computes grant/revoke diffs against the warehouse; with
    * the store as the warehouse, replacing the recorded state is the
    * same semantics.
    */
  def writeGrants(name: String, grants: Map[String, Seq[String]]): Unit =
    if (grants.isEmpty) fs.delete(grantsFile(name), false)
    else {
      fs.mkdirs(schemaDir)
      writeStr(grantsFile(name),
        graft.artifacts.Json.write(
          scala.collection.immutable.SortedMap.from(grants)))
    }

  // ---- persisted docs (reference config.py:86 persist_docs: relation/
  // column comments — the warehouse analogue is COMMENT ON / column
  // TBLPROPERTIES; with the store as the warehouse, the comment
  // metadata lives next to the relation and docs-generate reads it) ----

  private def commentsFile(name: String): HPath = new HPath(schemaDir, s"$name.comments.json")

  /** Record the FULL persisted-docs state for a relation: optional
    * relation comment + column → comment. Each write replaces the
    * previous state, so disabling persist_docs clears the comments on
    * the next run (same replace-the-desired-state semantics as grants).
    */
  def writeComments(name: String, relation: Option[String],
      columns: Map[String, String]): Unit =
    if (relation.isEmpty && columns.isEmpty) fs.delete(commentsFile(name), false)
    else {
      fs.mkdirs(schemaDir)
      writeStr(commentsFile(name),
        graft.artifacts.Json.write(Map(
          "relation" -> relation.getOrElse(""),
          "columns" -> scala.collection.immutable.SortedMap.from(columns))))
    }

  /** (relation comment, column → comment) as persisted — empty when
    * the node never enabled persist_docs.
    */
  def comments(name: String): (Option[String], Map[String, String]) =
    if (!fsExists(commentsFile(name))) (None, Map.empty)
    else graft.artifacts.Json.parse(readStr(commentsFile(name))) match {
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
    if (!fsExists(grantsFile(name))) Map.empty
    else graft.artifacts.Json.parse(readStr(grantsFile(name))) match {
      case m: Map[String @unchecked, Any @unchecked] => m.map {
        case (k, v: Seq[Any @unchecked]) => k -> v.map(_.toString)
        case (k, v) => k -> Seq(v.toString)
      }
      case _ => Map.empty
    }

  // ---- materialized-view definition bookkeeping ----

  private def mvDefFile(name: String): HPath = new HPath(schemaDir, s"$name.mv.sql")

  /** Record a materialized view's defining SQL alongside its table data
    * (the piece that distinguishes an MV from a plain table: the engine
    * can re-run the definition to refresh, and detect redefinition for
    * on_configuration_change).
    */
  def writeMvDefinition(name: String, sql: String): Unit = {
    fs.mkdirs(schemaDir)
    writeStr(mvDefFile(name), sql)
  }

  def mvDefinition(name: String): Option[String] =
    if (fsExists(mvDefFile(name))) Some(readStr(mvDefFile(name))) else None

  /** Shallow clone: new relation pointing at the same data version
    * (reference CloneRunner, core/dbt/task/clone.py:19-161; Spark-side
    * analogue of CREATE TABLE ... SHALLOW CLONE). Falls back to a view
    * when the source is a view.
    */
  def clone(fromStore: RelationStore, name: String): Unit = {
    if (fromStore.isView(name)) {
      val sql = fromStore.readStr(fromStore.viewFile(name))
      writeView(name, sql)
    } else {
      val src = fromStore.addressable(name).getOrElse(
        throw new IllegalStateException(s"cannot clone missing relation $name"))
      // pointer-only clone: a view over the source's current version
      // (plus any live delta landings — addressable() unions them in)
      writeView(name, s"SELECT * FROM $src")
    }
  }

  /** View definition text, if this relation is a view. */
  def viewSql(name: String): Option[String] =
    if (isView(name)) Some(readStr(viewFile(name))) else None

  /** SQL-addressable reference to this relation usable from ANOTHER
    * session/store (defer/clone): a direct parquet path for
    * directory-layout tables, per-file selects for manifest versions
    * whose files span dirs, an inline subquery for views.
    */
  def addressable(name: String): Option[String] =
    if (isView(name)) viewSql(name).map(sql => s"(\n$sql\n)")
    else if (isBucketed(name)) Some(ensureBucketedRegistered(name))
    else {
      def dirSel(p: String) = s"SELECT * FROM parquet.`$p`"
      val live = liveDeltaIds(name).map(id => dirSel(deltaDirOf(name, id).toString))
      val base: Seq[String] = currentVersion(name).toSeq.flatMap { v =>
        manifestOf(name, v) match {
          case Some(m) if m.layout == "files" =>
            if (m.entries.isEmpty) Nil
            else if (m.entries.forall(_.rel.startsWith(s"v$v/")))
              Seq(dirSel(verDir(name, v).toString)) // self-contained
            else m.entries.map(e => dirSel(new HPath(tableDir(name), e.rel).toString))
          case Some(m) if m.layout == "partitioned" =>
            // partition columns don't live in the data files: project
            // each entry's leaf values back as typed literals, in the
            // stored column order
            val st = storedSchemaOf(name).getOrElse(
              throw new IllegalStateException(s"no stored schema for $schema.$name"))
            m.entries.map { e =>
              val vals = e.leafKey.split('/').filter(_.contains('=')).map { seg =>
                val eq = seg.indexOf('=')
                ManifestFileIndex.unescapePathName(seg.take(eq)) ->
                  ManifestFileIndex.unescapePathName(seg.drop(eq + 1))
              }.toMap
              val cols = st.fields.map { f =>
                vals.get(f.name) match {
                  case Some("__HIVE_DEFAULT_PARTITION__") =>
                    s"CAST(NULL AS ${f.dataType.sql}) AS `${f.name}`"
                  case Some(raw) =>
                    s"CAST('${raw.replace("'", "''")}' AS ${f.dataType.sql}) AS `${f.name}`"
                  case None => s"`${f.name}`"
                }
              }
              s"SELECT ${cols.mkString(", ")} FROM parquet.`" +
                s"${new HPath(tableDir(name), e.rel)}`"
            }
          case _ => Seq(dirSel(verDir(name, v).toString)) // legacy/bucketed dir
        }
      }
      (base ++ live) match {
        case Seq() => None
        case Seq(one) if one.startsWith("SELECT * FROM parquet.`") =>
          // bare table reference for the simple single-dir case
          Some(one.stripPrefix("SELECT * FROM "))
        case many => Some(many.mkString("(\n", "\nUNION ALL\n", "\n)"))
      }
    }

  def list(): Seq[String] =
    listNames(schemaDir).flatMap { st =>
      val fn = st.getPath.getName
      if (st.isDirectory &&
        (fsExists(new HPath(st.getPath, "_current")) || liveDeltaIds(fn).nonEmpty)) Some(fn)
      else if (fn.endsWith(".view.sql")) Some(fn.stripSuffix(".view.sql"))
      else None
    }.sorted

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
}
