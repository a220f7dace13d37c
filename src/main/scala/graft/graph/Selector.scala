package graft.graph

import scala.util.matching.Regex

import graft.core._

/** Node-selection spec: `--select "tag:nightly+ @model 2+my_model"` with globs
  * (reference: regex core/dbt/graph/selector_spec.py:15-22, set ops
  * selector_spec.py:57+, methods selector_methods.py:45-930, traversal
  * graph.py:29-96, indirect selection selector.py:229-287).
  *
  * Grammar: space-separated criteria are UNIONed; comma-joined criteria
  * inside one token are INTERSECTed; `--exclude` removes its matches.
  * Each criterion: [@][N+]method:value[+N] with glob `*` support; bare
  * values use the fqn/name method.
  */
object Selector {
  final case class Criterion(
      method: String,
      value: String,
      childrenDepth: Option[Int], // suffix +N (None = not requested; Some(MaxValue) = unbounded)
      parentsDepth: Option[Int], // prefix N+
      atOperator: Boolean)

  private val critRe: Regex =
    raw"""^(@?)(?:(\d*)(\+))?((?:[\w.]+):)?(.+?)(?:(\+)(\d*))?$$""".r

  def parseCriterion(tok: String): Criterion = tok match {
    case critRe(at, pDepth, pPlus, methodColon, value, cPlus, cDepth) =>
      val method = Option(methodColon).map(_.stripSuffix(":")).getOrElse("fqn")
      Criterion(
        method = method,
        value = value,
        childrenDepth =
          if (cPlus == null) None
          else if (cDepth == null || cDepth.isEmpty) Some(Int.MaxValue)
          else Some(cDepth.toInt),
        parentsDepth =
          if (pPlus == null) None
          else if (pDepth == null || pDepth.isEmpty) Some(Int.MaxValue)
          else Some(pDepth.toInt),
        atOperator = at == "@")
    case _ => throw new IllegalArgumentException(s"cannot parse selector: $tok")
  }

  private def globMatch(pattern: String, s: String): Boolean =
    if (!pattern.contains("*")) pattern == s
    else s.matches(pattern.split("\\*", -1).map(Regex.quote).mkString(".*"))

  /** Base (pre-graph-operator) match for one criterion — the "method"
    * dispatch (reference selector_methods.py registry :909).
    */
  private def baseMatch(
      c: Criterion,
      manifest: Manifest,
      stateManifest: Option[StateView],
      previousStatuses: Map[String, String],
      fresherSources: Set[String],
      currentView: () => StateView): Set[String] = {
    def all = manifest.all
    c.method match {
      case "fqn" =>
        all.collect { case (id, n) if globMatch(c.value, n.name) || globMatch(c.value, id) => id }.toSet
      case "tag" =>
        all.collect { case (id, n) if n.tags.exists(globMatch(c.value, _)) => id }.toSet
      case "source" =>
        manifest.sources.collect {
          case (id, s) if globMatch(c.value, s.sourceName) ||
            globMatch(c.value, s"${s.sourceName}.${s.name}") => id
        }.toSet
      case "path" =>
        all.collect {
          case (id, n: ModelNode) if globMatch(c.value, n.path) => id
        }.toSet
      case "package" =>
        all.collect { case (id, n) if globMatch(c.value, n.packageName) => id }.toSet
      case "resource_type" =>
        all.collect { case (id, n) if n.resourceType.name == c.value => id }.toSet
      case "config.materialized" =>
        all.collect { case (id, n) if n.config.materialized.name == c.value => id }.toSet
      case "test_type" =>
        // generic (schema) vs singular (data) — reference selector_methods.py:370
        all.collect {
          case (id, t: TestNode)
            if (c.value == "generic" && t.attachedTo.nonEmpty) ||
               (c.value == "singular" && t.attachedTo.isEmpty) => id
        }.toSet
      case "test_name" =>
        all.collect {
          case (id, t: TestNode) if globMatch(c.value + "*", t.name) => id
        }.toSet
      case "state" =>
        val old = stateManifest.getOrElse(
          throw new IllegalArgumentException("state: selector requires --state manifest"))
        stateMatchView(c.value, currentView(), old)
      case "result" =>
        previousStatuses.collect { case (id, st) if st == c.value => id }.toSet
      case "unit_test" =>
        manifest.unitTests.collect { case (id, u) if globMatch(c.value, u.name) => id }.toSet
      case "group" =>
        all.collect { case (id, n) if n.config.group.exists(globMatch(c.value, _)) => id }.toSet
      case "access" =>
        all.collect { case (id, n) if n.config.access.contains(c.value) => id }.toSet
      case "version" =>
        all.collect { case (id, n) if n.config.version.exists(globMatch(c.value, _)) => id }.toSet
      case "exposure" =>
        all.collect { case (id, n: ExposureNode) if globMatch(c.value, n.name) => id }.toSet
      case "metric" =>
        all.collect { case (id, n: MetricNode) if globMatch(c.value, n.name) => id }.toSet
      case "semantic_model" =>
        all.collect { case (id, n: SemanticModelNode) if globMatch(c.value, n.name) => id }.toSet
      case "saved_query" =>
        all.collect { case (id, n: SavedQueryNode) if globMatch(c.value, n.name) => id }.toSet
      case "source_status" =>
        // sources whose max_loaded_at advanced vs the state artifacts
        // (reference SourceStatusSelectorMethod, selector_methods.py:45-114)
        if (c.value != "fresher")
          throw new IllegalArgumentException(s"unsupported source_status:${c.value}")
        fresherSources
      case other =>
        throw new IllegalArgumentException(s"unknown selector method: $other")
    }
  }

  /** The `state:` method family (reference StateSelectorMethod
    * `state_checks`, selector_methods.py:734-760): new / old /
    * modified / unmodified plus the modified.* submethods. Both sides
    * compare through the v12 document shape (StateView), so drift in
    * ANY persisted facet — body checksum, config, relation addressing,
    * descriptions, contract, upstream macros — is visible.
    */
  def stateMatch(value: String, current: Manifest, old: StateView): Set[String] =
    stateMatchView(value, StateView.of(current), old)

  /** Same, with the current-side view precomputed — select() evaluates
    * many criteria against one manifest and the doc render is O(nodes).
    */
  def stateMatchView(value: String, cur: StateView, old: StateView): Set[String] = {
    def check(f: (Option[StateView.NodeState], StateView.NodeState) => Boolean): Set[String] =
      cur.nodes.collect { case (id, n) if f(old.nodes.get(id), n) => id }.toSet
    def macrosModified(n: StateView.NodeState): Boolean =
      n.macros.exists(m => !old.macroSums.get(m).contains(cur.macroSums.getOrElse(m, "")))
    // state_modified_compare_more_unrendered_values (reference
    // context_config.py:315-335): under the flag, compare the config AS
    // WRITTEN (unrendered facet) when both sides carry one — so vars/
    // target rendering drift alone is not "modified" — falling back to
    // the rendered facet against manifests that predate the facet
    def configModified(s: StateView.NodeState, n: StateView.NodeState): Boolean =
      if (cur.compareUnrendered && s.unrenderedConfig.nonEmpty && n.unrenderedConfig.nonEmpty)
        s.unrenderedConfig != n.unrenderedConfig
      else s.config != n.config
    def contentModified(o: Option[StateView.NodeState], n: StateView.NodeState): Boolean =
      o match {
        case None => true // new node counts as modified
        case Some(s) =>
          s.checksum != n.checksum || configModified(s, n) ||
          s.relation != n.relation || s.descriptions != n.descriptions ||
          s.contract != n.contract || macrosModified(n) ||
          // state_modified_compare_vars (reference ProjectFlags): var
          // VALUE drift in the node's referenced vars counts as
          // modified only when the project opts in — checksums cover
          // the var-unrendered text, so without the flag a var change
          // selects nothing (the reference's raw_code semantics)
          (cur.compareVars && s.varsUsed != n.varsUsed)
      }
    value match {
      case "new" => check((o, _) => o.isEmpty)
      case "old" => check((o, _) => o.nonEmpty)
      case "modified" => check(contentModified)
      case "unmodified" => check((o, n) => !contentModified(o, n))
      case "modified.body" => check((o, n) => !o.exists(_.checksum == n.checksum))
      case "modified.configs" => check((o, n) => !o.exists(s => !configModified(s, n)))
      case "modified.relation" => check((o, n) => !o.exists(_.relation == n.relation))
      case "modified.persisted_descriptions" =>
        check((o, n) => !o.exists(_.descriptions == n.descriptions))
      case "modified.contract" => check((o, n) => !o.exists(_.contract == n.contract))
      case "modified.macros" => check((_, n) => macrosModified(n))
      case other => throw new IllegalArgumentException(s"unsupported state:$other")
    }
  }

  /** Back-compat entry: state:modified between two live manifests. */
  def modified(current: Manifest, old: Manifest): Set[String] =
    stateMatch("modified", current, StateView.of(old))

  def select(
      manifest: Manifest,
      graph: Digraph,
      selectTokens: Seq[String],
      excludeTokens: Seq[String] = Nil,
      stateManifest: Option[StateView] = None,
      previousStatuses: Map[String, String] = Map.empty,
      indirect: String = "eager",
      fresherSources: Set[String] = Set.empty): Set[String] = {

    // rendered at most once per select(), only if a state: criterion asks
    lazy val curView: StateView = StateView.of(manifest)

    def evalToken(tok: String): Set[String] =
      tok.split(",").map(t => evalCriterion(t.trim)).reduce(_ intersect _)

    def evalCriterion(tok: String): Set[String] = {
      val c = parseCriterion(tok)
      val base = baseMatch(c, manifest, stateManifest, previousStatuses, fresherSources,
        () => curView)
      var out = base
      c.parentsDepth.foreach(d => out = out ++ base.flatMap(graph.ancestors(_, d)))
      c.childrenDepth.foreach(d => out = out ++ base.flatMap(graph.descendants(_, d)))
      if (c.atOperator) {
        // @model: node + descendants + ancestors of those descendants
        // (reference selector_spec.py SELECTOR_AT)
        val desc = base.flatMap(graph.descendants(_))
        out = out ++ desc ++ (base ++ desc).flatMap(graph.ancestors(_))
      }
      out
    }

    val selected =
      if (selectTokens.isEmpty) manifest.all.keySet
      else selectTokens.map(evalToken).reduce(_ union _)
    val excluded =
      if (excludeTokens.isEmpty) Set.empty[String]
      else excludeTokens.map(evalToken).reduce(_ union _)
    expandIndirect(manifest, graph, selected -- excluded, indirect)
  }

  /** Indirect test selection (reference selector.py:229-287
    * expand_selection / incorporate_indirect_nodes): tests ride along
    * with their tested nodes per the chosen mode.
    */
  def expandIndirect(
      manifest: Manifest,
      graph: Digraph,
      selected: Set[String],
      mode: String): Set[String] = {
    if (mode == "empty") return selected
    val tests = manifest.nodes.collect { case (id, t: TestNode) => (id, t) }
    val extra = tests.collect {
      case (id, t) if !selected.contains(id) =>
        val deps = t.dependsOn.toSet
        mode match {
          case "eager" if deps.intersect(selected).nonEmpty => Some(id)
          case "cautious" if deps.nonEmpty && deps.subsetOf(selected) => Some(id)
          case "buildable" if deps.nonEmpty &&
            deps.subsetOf(selected ++ selected.flatMap(graph.ancestors(_))) => Some(id)
          case _ => None
        }
    }.flatten
    selected ++ extra
  }
}
