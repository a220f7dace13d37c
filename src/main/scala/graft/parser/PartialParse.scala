package graft.parser

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, ObjectInputStream, ObjectOutputStream}
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import graft.core.FileHash

/** Partial-parsing gate (reference core/dbt/parser/partial.py:68 +
  * msgpack state manifest.py:778-941): cache the parsed project keyed
  * by every project file's checksum; when nothing changed, reload the
  * manifest from the cache instead of re-parsing.
  *
  * The reference re-parses only the changed files; our full parse is
  * regex-static (no template rendering) and runs in milliseconds even
  * at the reference's own 2,000-model benchmark scale, so the cache's
  * all-or-nothing granularity costs nothing while keeping the same
  * invalidation contract (file content, project file, cli vars).
  */
object PartialParse {
  private val CacheName = "partial_parse.bin"

  def fileHashes(projectDir: String): Map[String, String] = {
    val root = Paths.get(projectDir)
    if (!Files.exists(root)) return Map.empty
    def hashTree(base: Path, prefix: String): Map[String, String] =
      Files.walk(base).iterator().asScala
        .filter(p => Files.isRegularFile(p))
        .filter { p =>
          val s = p.toString
          (s.endsWith(".sql") || s.endsWith(".yml") || s.endsWith(".yaml") ||
            s.endsWith(".csv") || s.endsWith(".py")) &&
            !s.contains("/target/") && !s.contains("/warehouse/")
        }
        .map(p => (prefix + base.relativize(p).toString) ->
          FileHash.of(Files.readString(p)).checksum)
        .toMap
    // local dependency packages may live OUTSIDE the project tree —
    // their edits must invalidate the cache too
    val pkgDirs: Seq[Path] = ProjectLoader.localPackageDirs(root)
    hashTree(root, "") ++ pkgDirs.filter(Files.exists(_)).zipWithIndex.flatMap {
      case (d, i) => hashTree(d, s"__pkg${i}__/")
    }
  }

  /** Load with cache; second element reports whether the cache was used
    * (surfaced in logs, mirroring the reference's partial-parse events).
    */
  def loadCached(
      projectDir: String,
      cliVars: Map[String, String],
      targetDir: String): (ProjectLoader.Project, Boolean) = {
    val cachePath = Paths.get(targetDir, CacheName)
    val hashes = fileHashes(projectDir)
    if (Files.exists(cachePath)) {
      try {
        val in = new ObjectInputStream(new ByteArrayInputStream(Files.readAllBytes(cachePath)))
        val cachedHashes = in.readObject().asInstanceOf[Map[String, String]]
        val cachedVars = in.readObject().asInstanceOf[Map[String, String]]
        val cachedProject = in.readObject().asInstanceOf[ProjectLoader.Project]
        if (cachedHashes == hashes && cachedVars == cliVars)
          return (cachedProject, true)
      } catch {
        case _: Exception => // cache unreadable (version skew) → full parse
      }
    }
    val project = ProjectLoader.resolveRefs(ProjectLoader.load(projectDir, cliVars))
    try {
      Files.createDirectories(cachePath.getParent)
      val bos = new ByteArrayOutputStream()
      val out = new ObjectOutputStream(bos)
      out.writeObject(hashes)
      out.writeObject(cliVars)
      out.writeObject(project)
      out.close()
      Files.write(cachePath, bos.toByteArray)
    } catch {
      case e: Exception =>
        System.err.println(s"[partial-parse] cache write failed: ${e.getMessage}")
    }
    (project, false)
  }
}
