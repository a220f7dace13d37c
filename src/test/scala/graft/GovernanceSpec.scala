package graft

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

import graft.parser.{ProjectLoader, Template}

/** Model-governance enforcement (reference manifest.py
  * is_invalid_private_ref / is_invalid_protected_ref and
  * tests/functional/access) + env_var context function (base.py:304).
  */
class GovernanceSpec extends AnyFunSuite {

  private def proj(files: (String, String)*): Path = {
    val dir = Files.createTempDirectory("graft_gov")
    files.foreach { case (rel, content) =>
      val p = dir.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.writeString(p, content)
    }
    dir
  }

  private def loadResolved(dir: Path) =
    ProjectLoader.resolveRefs(ProjectLoader.load(dir.toString))

  test("private model is not refable from another group") {
    val dir = proj(
      "dbt_project.yml" -> "name: gov\n",
      "models/core_secret.sql" ->
        "{{ config(group='core', access='private') }}\nSELECT 1 AS id",
      "models/other_reader.sql" ->
        "{{ config(group='marketing') }}\nSELECT * FROM {{ ref('core_secret') }}")
    val e = intercept[IllegalArgumentException](loadResolved(dir))
    assert(e.getMessage.contains("access violation"))
    assert(e.getMessage.contains("core_secret"))
  }

  test("private model IS refable from inside its own group") {
    val dir = proj(
      "dbt_project.yml" -> "name: gov\n",
      "models/core_secret.sql" ->
        "{{ config(group='core', access='private') }}\nSELECT 1 AS id",
      "models/core_reader.sql" ->
        "{{ config(group='core') }}\nSELECT * FROM {{ ref('core_secret') }}")
    val p = loadResolved(dir)
    val reader = p.manifest.nodes("model.gov.core_reader")
    assert(reader.dependsOn.contains("model.gov.core_secret"))
  }

  test("restrict-access package: protected models are package-private, public ones are not") {
    val pkg = proj(
      "dbt_project.yml" -> "name: pkg\nrestrict-access: true\n",
      "models/pkg_internal.sql" -> "SELECT 1 AS id",
      "models/pkg_api.sql" -> "{{ config(access='public') }}\nSELECT 2 AS id")
    def root(modelSql: String): Path = proj(
      "dbt_project.yml" -> "name: root\n",
      "packages.yml" -> s"packages:\n  - local: ${pkg.toString}\n",
      "models/consumer.sql" -> modelSql)
    // default (protected) model of a restricted package → parse error
    val bad = intercept[IllegalArgumentException](
      loadResolved(root("SELECT * FROM {{ ref('pkg', 'pkg_internal') }}")))
    assert(bad.getMessage.contains("restricted package"))
    // public model of the same package resolves fine
    val ok = loadResolved(root("SELECT * FROM {{ ref('pkg', 'pkg_api') }}"))
    assert(ok.manifest.nodes("model.root.consumer").dependsOn.contains("model.pkg.pkg_api"))
    // and without restrict-access the protected ref is legal (dbt default)
    val openPkg = proj(
      "dbt_project.yml" -> "name: pkg\n",
      "models/pkg_internal.sql" -> "SELECT 1 AS id")
    val open = proj(
      "dbt_project.yml" -> "name: root\n",
      "packages.yml" -> s"packages:\n  - local: ${openPkg.toString}\n",
      "models/consumer.sql" -> "SELECT * FROM {{ ref('pkg', 'pkg_internal') }}")
    assert(loadResolved(open).manifest.nodes("model.root.consumer")
      .dependsOn.contains("model.pkg.pkg_internal"))
  }

  test("env_var substitutes, defaults, and refuses secrets") {
    def render(raw: String, env: Map[String, String]): String =
      Template.render(raw, identity, (a, b) => s"$a.$b", env = env)
    assert(render("SELECT '{{ env_var('WAREHOUSE') }}' AS w", Map("WAREHOUSE" -> "wh1"))
      == "SELECT 'wh1' AS w")
    assert(render("SELECT '{{ env_var('MISSING', 'fallback') }}' AS w", Map.empty)
      == "SELECT 'fallback' AS w")
    val missing = intercept[IllegalArgumentException](
      render("SELECT '{{ env_var('MISSING') }}'", Map.empty))
    assert(missing.getMessage.contains("env_var required"))
    val secret = intercept[IllegalArgumentException](
      render("SELECT '{{ env_var('DBT_ENV_SECRET_TOKEN') }}'",
        Map("DBT_ENV_SECRET_TOKEN" -> "sssh")))
    assert(secret.getMessage.contains("secret"))
  }
}
