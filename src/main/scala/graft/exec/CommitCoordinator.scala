package graft.exec

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.{FileContext, FileSystem, Path => HPath}

/** The store's commit-arbitration primitive — the seam where
  * [[RelationStore]]'s optimistic concurrency meets the filesystem's
  * actual atomicity guarantees (the role Delta's LogStore and Iceberg's
  * catalog play: the table format is portable, the COMMIT primitive is
  * per-store).
  *
  * The OCC protocol needs exactly one cross-process primitive: an
  * atomic CREATE-NO-OVERWRITE of the version-slot reservation marker
  * (two writers racing one slot, exactly one wins). That primitive
  * genuinely exists on a local filesystem (O_EXCL) and on HDFS-family
  * stores (namenode-serialized rename without OVERWRITE) — and does
  * NOT exist on plain S3, where "rename" is a client-side copy+delete
  * and two concurrent writers can both believe they created the
  * marker. Pretending otherwise is how tables get torn, which is why
  * Delta requires an external LogStore (DynamoDB) for concurrent S3
  * writers. So each coordinator DECLARES [[atomicReservation]], and the
  * store REFUSES concurrent-writer mode on stores that can't back it —
  * loudly at the first commit, not silently at the first lost update.
  * An external arbiter (a DynamoDB/ZooKeeper-style lock service) plugs
  * in by implementing this trait and passing it to the store.
  *
  * Liveness ([[heartbeat]]) is an in-place rewrite of the marker's
  * content, NOT `FileSystem.setTimes` (unsupported on object stores)
  * and NOT write-tmp-then-rename (on object stores that rename is
  * copy+delete, with a window where the marker doesn't exist — a
  * concurrent GC would misread the slot as free mid-commit). An
  * in-place create-overwrite is a truncate on POSIX/HDFS and an atomic
  * PUT on object stores: the marker is never absent.
  */
trait CommitCoordinator {

  /** Whether [[reserve]] is genuinely atomic across PROCESSES on this
    * store. When false, two concurrent writers can both win one slot —
    * the store refuses concurrent-writer mode.
    */
  def atomicReservation: Boolean

  /** Store description for refusal/error messages. */
  def describe: String

  /** Atomically create `marker` with content `token` iff it does not
    * exist. Returns true exactly when THIS call created it.
    */
  def reserve(marker: HPath, token: String): Boolean

  /** Refresh the marker's liveness clock (its modification time, read
    * by GC's torn-reservation horizon) by rewriting its content in
    * place. The caller owns the slot; the marker must never be absent
    * at any instant during the rewrite.
    */
  def heartbeat(marker: HPath): Unit

  /** Release a reservation: remove the marker file AND any arbitration
    * state the coordinator holds for it elsewhere. Every store-side
    * marker delete (publish, slot release, GC reclaim) routes through
    * here so an out-of-domain coordinator's lock state cannot outlive
    * the marker it arbitrates — a leaked lock would make the slot
    * unreservable forever. Idempotent; tolerates an already-absent
    * marker (concurrent GC passes race benignly).
    */
  def release(marker: HPath): Unit

  /** Reclaim arbitration state STRANDED by a crash — lock records older
    * than `horizonMs` whose arbitrated store-side marker is ABSENT (the
    * crash windows: between lock-win and marker materialization, and
    * between release's marker delete and lock delete). Returns the
    * number reclaimed. Default no-op: the built-in coordinators' only
    * artifact IS the marker, which the store's own GC already sweeps;
    * only out-of-domain coordinators hold state elsewhere. The store's
    * GC calls this on every pass with its torn-reservation horizon.
    */
  def reclaimStranded(horizonMs: Long): Int = 0
}

object CommitCoordinator {

  /** Schemes whose `FileContext.rename` WITHOUT the OVERWRITE option is
    * a genuine namenode/metadata-server-serialized create-no-overwrite.
    * Deliberately conservative: object-store connectors (s3a, gs, wasb,
    * abfs, oss, cos, …) are NOT listed even where some offer
    * conditional writes, because the Hadoop connector surface doesn't
    * expose them as atomic rename — those stores need an external
    * coordinator (or single-writer mode).
    */
  private val AtomicRenameSchemes = Set("hdfs", "viewfs", "webhdfs", "swebhdfs")

  /** The built-in coordinator for a store root: O_EXCL on the local
    * filesystem, no-overwrite rename on HDFS-family schemes, and a
    * best-effort (declared NON-atomic) fallback everywhere else.
    */
  def forStore(fs: FileSystem, fctx: FileContext): CommitCoordinator = {
    val scheme = Option(fs.getUri.getScheme).getOrElse("file")
    if (scheme == "file") new LocalExclusiveCreate(fs)
    else new RenameNoOverwrite(fs, fctx, scheme,
      atomic = AtomicRenameSchemes.contains(scheme))
  }

  /** Local filesystem: cross-process atomicity is the kernel's O_EXCL
    * exclusive create (FileContext's no-overwrite rename is
    * check-then-rename there — POSIX rename(2) replaces silently).
    */
  private final class LocalExclusiveCreate(fs: FileSystem) extends CommitCoordinator {
    override def atomicReservation: Boolean = true
    override def describe: String = "local filesystem (O_EXCL exclusive create)"
    override def reserve(marker: HPath, token: String): Boolean =
      try {
        val p = java.nio.file.Paths.get(fs.makeQualified(marker).toUri)
        java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.createFile(p) // O_EXCL: fails iff it exists
        java.nio.file.Files.write(p, token.getBytes(UTF_8))
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        case _: java.io.IOException => false
      }
    override def heartbeat(marker: HPath): Unit =
      rewriteInPlace(fs, marker)
    override def release(marker: HPath): Unit =
      scala.util.Try(fs.delete(marker, false))
  }

  /** HDFS-family stores: rename without OVERWRITE is the atomic
    * create-no-overwrite primitive (serialized by the namenode). The
    * same code path doubles as the declared-non-atomic best-effort
    * fallback for unknown schemes — where [[atomicReservation]] is
    * false and the store only allows single-writer mode.
    */
  private final class RenameNoOverwrite(
      fs: FileSystem, fctx: FileContext, scheme: String, atomic: Boolean)
      extends CommitCoordinator {
    override def atomicReservation: Boolean = atomic
    override def describe: String =
      if (atomic) s"$scheme (atomic no-overwrite rename)"
      else s"$scheme (NO atomic create-no-overwrite primitive)"
    override def reserve(marker: HPath, token: String): Boolean = {
      val tmp = new HPath(marker.getParent,
        s".${marker.getName}.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
      val out = fs.create(tmp, true)
      try out.write(token.getBytes(UTF_8)) finally out.close()
      try {
        fctx.rename(tmp, marker)
        // belt-and-braces read-back: the winner's token is in the marker
        val in = fs.open(marker)
        try {
          val buf = new java.io.ByteArrayOutputStream()
          val b = new Array[Byte](256)
          var n = in.read(b)
          while (n >= 0) { buf.write(b, 0, n); n = in.read(b) }
          new String(buf.toByteArray, UTF_8) == token
        } finally in.close()
      } catch {
        case _: java.io.IOException => fs.delete(tmp, false); false
      }
    }
    override def heartbeat(marker: HPath): Unit =
      rewriteInPlace(fs, marker)
    override def release(marker: HPath): Unit =
      scala.util.Try(fs.delete(marker, false))
  }

  /** In-place overwrite with the current timestamp: refreshes the
    * marker's mtime on every store (POSIX truncate, HDFS re-create,
    * object-store PUT) without any instant where the marker is absent.
    */
  private[exec] def rewriteInPlace(fs: FileSystem, marker: HPath): Unit =
    scala.util.Try {
      val out = fs.create(marker, true)
      try out.write(System.currentTimeMillis().toString.getBytes(UTF_8))
      finally out.close()
    }
}

/** External commit arbitration in a SEPARATE domain: a lock DIRECTORY
  * on a filesystem that HAS an atomic create-no-overwrite primitive
  * (a shared local/NFS dir, an HDFS path) arbitrating commits for a
  * store root whose own filesystem does NOT (an object store). This
  * is the simplest real member of the lock-service family Delta's
  * S3DynamoDBLogStore belongs to — the decision lives where atomicity
  * exists, the state the store protocol READS lives in the store.
  *
  * THE MARKER-MATERIALIZATION CONTRACT (binding on every external
  * coordinator, not just this one): winning [[reserve]] MUST also
  * create the store-side marker file, and [[heartbeat]] MUST refresh
  * that marker's mtime — the lock only DECIDES; the store protocol
  * reads reservation state from the marker itself (`isReserved`
  * probes its existence; GC's `reservedLive` horizon reads its
  * mtime; crash adoption checks it). A coordinator that arbitrates
  * without materializing the marker makes every reserved slot look
  * free to readers and sweepable to GC.
  *
  * Every coordinator instance arbitrating one warehouse must be
  * configured with the SAME lock root — that shared directory IS the
  * lock service. Crash windows (between winning the lock and
  * materializing the marker; between release's marker delete and its
  * lock delete) strand a lock file whose marker is absent — the
  * version-slot number stays skipped (writers probe upward past it;
  * correctness unaffected), and [[reclaimStranded]] sweeps the FILE
  * once it ages past the GC horizon: each lock records its arbitrated
  * marker's qualified path, so "marker absent + older than horizon"
  * is checkable from the lock alone. Live commits are never at risk:
  * a fresh reservation is younger than the horizon, and a long-running
  * one keeps its marker PRESENT (the heartbeat refreshes the marker,
  * which is exactly what reclaim probes).
  */
final class DirectoryLockCoordinator(
    lockRoot: HPath,
    lockConf: org.apache.hadoop.conf.Configuration,
    storeFs: FileSystem) extends CommitCoordinator {
  private val lockFs: FileSystem = lockRoot.getFileSystem(lockConf)
  private val inner: CommitCoordinator = CommitCoordinator.forStore(
    lockFs, FileContext.getFileContext(lockFs.getUri, lockConf))
  require(inner.atomicReservation,
    s"lock root $lockRoot is on ${inner.describe} — a lock domain must " +
      "itself have an atomic create-no-overwrite primitive")

  override def atomicReservation: Boolean = true
  override def describe: String =
    s"directory-lock coordinator ($lockRoot arbitrating ${storeFs.getUri})"

  /** One lock file per arbitrated marker, named by the marker's
    * qualified-path hash (store paths aren't valid single path
    * segments; the hash is stable across sessions by construction).
    */
  private def lockFor(marker: HPath): HPath = {
    val key = java.security.MessageDigest.getInstance("SHA-1")
      .digest(storeFs.makeQualified(marker).toString.getBytes(UTF_8))
      .map("%02x".format(_)).mkString
    new HPath(lockRoot, s"lk_$key")
  }

  override def reserve(marker: HPath, token: String): Boolean = {
    // the lock records the marker path it arbitrates (line 2) so
    // reclaimStranded can probe marker absence from the lock alone —
    // the lock NAME is a one-way hash of that path
    val won = inner.reserve(lockFor(marker),
      token + "\n" + storeFs.makeQualified(marker).toString)
    if (won) {
      // materialize the store-side marker (see the contract above) —
      // a plain overwrite-create is fine: this process owns the slot
      val out = storeFs.create(marker, true)
      try out.write(token.getBytes(UTF_8)) finally out.close()
    }
    won
  }

  /** The liveness clock lives in the STORE domain (GC reads the
    * marker's mtime there), so the heartbeat rewrites the marker, not
    * the lock.
    */
  override def heartbeat(marker: HPath): Unit =
    CommitCoordinator.rewriteInPlace(storeFs, marker)

  override def release(marker: HPath): Unit = {
    // marker first: the lock must never vanish while the marker still
    // claims the slot (a competitor could double-grant it)
    scala.util.Try(storeFs.delete(marker, false))
    scala.util.Try(lockFs.delete(lockFor(marker), false))
  }

  /** Sweep lock files stranded by the crash windows documented above:
    * older than `horizonMs` (by lock-file mtime — never refreshed after
    * reserve, so age means "reserved long ago") AND whose recorded
    * marker is absent from the store. Marker present ⇒ the reservation
    * is live or GC-adoptable and its lifecycle belongs to [[release]];
    * unreadable/legacy lock content (no recorded path) is left alone —
    * provably-stranded only.
    */
  override def reclaimStranded(horizonMs: Long): Int = {
    val sts =
      try lockFs.listStatus(lockRoot)
      catch { case _: java.io.FileNotFoundException => return 0 }
    val now = System.currentTimeMillis()
    var n = 0
    sts.foreach { st =>
      if (st.getPath.getName.startsWith("lk_") &&
          now - st.getModificationTime >= horizonMs) {
        val recordedMarker = scala.util.Try {
          val in = lockFs.open(st.getPath)
          try {
            val buf = new java.io.ByteArrayOutputStream()
            val b = new Array[Byte](256)
            var r = in.read(b)
            while (r >= 0) { buf.write(b, 0, r); r = in.read(b) }
            new String(buf.toByteArray, UTF_8)
          } finally in.close()
        }.toOption.map(_.split('\n')).filter(_.length >= 2).map(_(1).trim)
          .filter(_.nonEmpty)
        val stranded = recordedMarker.exists(mp =>
          scala.util.Try(!storeFs.exists(new HPath(mp))).getOrElse(false))
        if (stranded && scala.util.Try(lockFs.delete(st.getPath, false)).getOrElse(false))
          n += 1
      }
    }
    n
  }
}
