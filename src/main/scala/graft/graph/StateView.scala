package graft.graph

import java.nio.file.{Files, Paths}

import graft.artifacts.{Artifacts, Json}
import graft.core.Manifest

/** Comparison view of a manifest for `state:` selection (reference
  * StateSelectorMethod, core/dbt/graph/selector_methods.py:609-810).
  *
  * Both sides of every comparison go through the SAME v12 document
  * shape: the state side parses a persisted manifest.json, the current
  * side renders the live manifest with `Artifacts.manifestDoc` — so
  * field coverage can never drift between writer and comparator.
  */
final case class StateView(
    nodes: Map[String, StateView.NodeState],
    /** macro unique_id -> checksum (state:modified.macros). */
    macroSums: Map[String, String],
    /** `state_modified_compare_vars` (reference ProjectFlags): when the
      * CURRENT side's project sets it, var-value drift in a node's
      * referenced vars counts as modified. Only meaningful on the
      * current-side view (the state side is just compared against).
      */
    compareVars: Boolean = false,
    /** `state_modified_compare_more_unrendered_values` (reference
      * ProjectFlags, context_config.py:315-335): when the CURRENT
      * side's project sets it, the config comparison uses the
      * UNRENDERED config facet where both sides carry one — so a
      * rendering-only difference (vars/target changing which config
      * renders) no longer reads as modified, while an edit to the
      * config as written still does.
      */
    compareUnrendered: Boolean = false)

object StateView {
  /** The per-node facets the reference's `same_*` methods compare. */
  final case class NodeState(
      /** same_body: content checksum (ours covers macro-expanded SQL,
        * var-unrendered — var drift is the [[varsUsed]] facet). */
      checksum: String,
      /** same_config: canonicalized config document. */
      config: String,
      /** same_database_representation: database/schema/alias triple. */
      relation: String,
      /** same_persisted_description: node + column descriptions. */
      descriptions: String,
      /** same_contract: enforced flag + column name/type pairs. */
      contract: String,
      /** depends_on.macros (unique_ids). */
      macros: Seq[String],
      /** var name -> value for every var() the node references —
        * compared only under state_modified_compare_vars. */
      varsUsed: String = "{}",
      /** Canonicalized unrendered_config — compared INSTEAD of
        * [[config]] under state_modified_compare_more_unrendered_values
        * when both sides carry one ("" = the manifest predates the
        * facet, fall back to the rendered comparison — the reference's
        * prefer-when-available rule, context_config.py:326-334). */
      unrenderedConfig: String = "")

  def read(manifestJsonPath: String): StateView = {
    val p = Paths.get(manifestJsonPath)
    fromDoc(Json.parse(Files.readString(p)) match {
      case m: Map[String @unchecked, Any @unchecked] => m
      case _ => Map.empty[String, Any]
    })
  }

  def of(manifest: Manifest): StateView =
    fromDoc(Artifacts.manifestDoc(manifest))
      .copy(compareVars = manifest.flag("state_modified_compare_vars"),
        compareUnrendered =
          manifest.flag("state_modified_compare_more_unrendered_values"))

  /** Canonical rendering: maps sorted by key so comparison is
    * insensitive to JSON object order across writer versions.
    */
  private def canon(v: Any): String = v match {
    case m: Map[_, _] =>
      m.asInstanceOf[Map[String, Any]].toSeq.sortBy(_._1)
        .map { case (k, x) => Json.quote(k) + ":" + canon(x) }
        .mkString("{", ",", "}")
    case l: Seq[_] => l.map(canon).mkString("[", ",", "]")
    case other => Json.write(other)
  }

  private val sections = Seq("nodes", "sources", "exposures", "metrics",
    "semantic_models", "saved_queries", "unit_tests")

  private def fromDoc(doc: Map[String, Any]): StateView = {
    def obj(v: Any): Map[String, Any] = v match {
      case m: Map[String @unchecked, Any @unchecked] => m
      case _ => Map.empty
    }
    val nodes = sections.flatMap { sec =>
      obj(doc.getOrElse(sec, Map.empty)).map { case (id, nd0) =>
        val nd = obj(nd0)
        val ck = nd.get("checksum") match {
          case Some(cm: Map[String @unchecked, Any @unchecked]) =>
            cm.getOrElse("checksum", "").toString
          // pre-v12 state manifests stored the bare hash string
          case Some(s) => String.valueOf(s)
          case None => ""
        }
        val cols = obj(nd.getOrElse("columns", Map.empty)).toSeq.sortBy(_._1).map(c => obj(c._2))
        id -> NodeState(
          checksum = ck,
          config = canon(nd.getOrElse("config", Map.empty)),
          relation = canon(Seq("database", "schema", "alias")
            .map(k => nd.getOrElse(k, null))),
          descriptions = canon(
            Seq(nd.getOrElse("description", "")) ++
              cols.map(c => c.getOrElse("name", "") + "=" + c.getOrElse("description", ""))),
          contract = canon(
            Seq(obj(nd.getOrElse("config", Map.empty)).getOrElse("contract", null)) ++
              cols.map(c => Seq(c.getOrElse("name", ""), c.getOrElse("data_type", null),
                c.getOrElse("constraints", Nil)))),
          macros = nd.get("depends_on") match {
            case Some(dm: Map[String @unchecked, Any @unchecked]) =>
              dm.getOrElse("macros", Nil) match {
                case l: Seq[_] => l.map(String.valueOf(_))
                case _ => Nil
              }
            case _ => Nil
          },
          varsUsed = canon(nd.getOrElse("vars_used", Map.empty)),
          // "" (not "{}") when absent: distinguishes a manifest written
          // before this facet existed from an empty unrendered config,
          // so the comparison can fall back to the rendered facet
          unrenderedConfig = nd.get("unrendered_config").map(canon).getOrElse(""))
      }
    }.toMap
    val macros = obj(doc.getOrElse("macros", Map.empty)).map { case (id, md0) =>
      val md = obj(md0)
      id -> (md.get("checksum") match {
        case Some(cm: Map[String @unchecked, Any @unchecked]) =>
          cm.getOrElse("checksum", "").toString
        case Some(s) => String.valueOf(s)
        case None => ""
      })
    }
    StateView(nodes, macros)
  }
}
