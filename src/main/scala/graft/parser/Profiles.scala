package graft.parser

import java.nio.file.{Files, Path, Paths}

/** profiles.yml resolution (reference core/dbt/config/profile.py):
  * the profile named by dbt_project.yml's `profile:` key supplies the
  * active TARGET — a named output carrying warehouse-side settings.
  * The engine honors the connection-agnostic ones: `schema` (the
  * store namespace materializations land in — reference
  * credentials.schema) and `threads` (DAG scheduler parallelism,
  * profile.py DEFAULT_THREADS = 1). Other output keys (`type`, hosts,
  * auth) describe a remote warehouse the engine IS, so they are
  * accepted and ignored.
  *
  * Search order for profiles.yml: `--profiles-dir` flag,
  * DBT_PROFILES_DIR, the project directory, ~/.dbt (reference
  * flags.py PROFILES_DIR default chain).
  *
  * Target selection (profile.py render_profile): `--target` override
  * wins, else the profile's `target:` key; a target name missing from
  * `outputs:` fails listing the valid names — the reference's
  * "valid target names for this profile" error.
  */
object Profiles {
  final case class ResolvedTarget(
      profileName: String,
      name: String,
      schema: Option[String],
      threads: Option[Int])

  def profilesPath(projectDir: String, profilesDirFlag: Option[String]): Option[Path] = {
    val candidates =
      profilesDirFlag.map(Paths.get(_)).toSeq ++
        sys.env.get("DBT_PROFILES_DIR").map(Paths.get(_)).toSeq :+
        Paths.get(projectDir) :+
        Paths.get(sys.props.getOrElse("user.home", "/root"), ".dbt")
    candidates.map(_.resolve("profiles.yml")).find(Files.exists(_))
  }

  /** None when the project has no resolvable profile (no profiles.yml,
    * or no matching profile entry) — the engine then runs with its
    * defaults, like `dbt parse` without a connection.
    */
  def resolve(
      projectDir: String,
      targetOverride: Option[String],
      profilesDirFlag: Option[String]): Option[ResolvedTarget] = {
    val path = profilesPath(projectDir, profilesDirFlag).getOrElse(return None)
    val doc = MiniYaml.parseMap(Files.readString(path))
    val projFile = Paths.get(projectDir).resolve("dbt_project.yml")
    val proj: Map[String, Any] =
      if (Files.exists(projFile)) MiniYaml.parseMap(Files.readString(projFile))
      else Map.empty
    // `profile:` names the entry; fall back to the project name, the
    // common convention when the key is omitted
    val profileName = proj.get("profile").map(_.toString)
      .orElse(proj.get("name").map(_.toString))
      .getOrElse(return None)
    val raw = doc.get(profileName) match {
      case Some(m: Map[String @unchecked, Any @unchecked]) => m
      case _ => return None
    }
    val outputs = raw.get("outputs") match {
      case Some(m: Map[String @unchecked, Any @unchecked]) => m
      case _ => throw new IllegalArgumentException(
        s"outputs not specified in profile '$profileName'")
    }
    val targetName = targetOverride
      .orElse(raw.get("target").map(_.toString))
      .getOrElse(throw new IllegalArgumentException(
        s"profile '$profileName' does not specify a default target"))
    val out = outputs.get(targetName) match {
      case Some(m: Map[String @unchecked, Any @unchecked]) => m
      case _ => throw new IllegalArgumentException(
        s"The profile '$profileName' does not have a target named '$targetName'. " +
          s"The valid target names for this profile are:\n" +
          outputs.keys.toSeq.sorted.map(o => s" - $o").mkString("\n"))
    }
    Some(ResolvedTarget(
      profileName = profileName,
      name = targetName,
      schema = out.get("schema").map(_.toString),
      threads = out.get("threads").map(_.toString.trim.toInt)))
  }
}
