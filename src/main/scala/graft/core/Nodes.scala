package graft.core

/** Core engine data model — the Spark-native mirror of the reference's
  * manifest IR (reference: core/dbt/contracts/graph/nodes.py:121 BaseNode
  * hierarchy, core/dbt/artifacts/resources/types.py:18 NodeType).
  *
  * Pure Scala, no Spark: the manifest lives on the driver and is a few
  * thousand nodes at most (the reference's own perf project is 2,000).
  */

/** Resource taxonomy (reference types.py:18-37, trimmed to what the
  * engine executes; Doc/Group/SavedQuery etc. are metadata-only there).
  */
sealed abstract class NodeType(val name: String) extends Serializable
object NodeType {
  case object Model extends NodeType("model")
  case object Seed extends NodeType("seed")
  case object Snapshot extends NodeType("snapshot")
  case object Test extends NodeType("test")
  case object UnitTest extends NodeType("unit_test")
  case object Source extends NodeType("source")
  case object Operation extends NodeType("operation")
  case object Analysis extends NodeType("analysis")
  case object Exposure extends NodeType("exposure")
  case object Metric extends NodeType("metric")
  case object SemanticModel extends NodeType("semantic_model")
  case object SavedQuery extends NodeType("saved_query")
  val executable: Set[NodeType] = Set(Model, Seed, Snapshot, Test, UnitTest)
  val refable: Set[NodeType] = Set(Model, Seed, Snapshot)
}

/** Materialization strategies (reference config.py:81 materialized +
  * config.py:82 incremental_strategy).
  */
sealed abstract class Materialized(val name: String) extends Serializable
object Materialized {
  case object View extends Materialized("view")
  case object Table extends Materialized("table")
  case object Incremental extends Materialized("incremental")
  case object Ephemeral extends Materialized("ephemeral")
  case object SeedMat extends Materialized("seed")
  case object SnapshotMat extends Materialized("snapshot")
  case object MaterializedView extends Materialized("materialized_view")
  def parse(s: String): Materialized = s match {
    case "view" => View
    case "table" => Table
    case "incremental" => Incremental
    case "ephemeral" => Ephemeral
    case "seed" => SeedMat
    case "snapshot" => SnapshotMat
    case "materialized_view" => MaterializedView
    case other => throw new IllegalArgumentException(s"unknown materialization: $other")
  }
}

/** Microbatch batch granularity (reference types.py:72-76 BatchSize). */
sealed abstract class BatchSize(val name: String) extends Serializable
object BatchSize {
  case object Hour extends BatchSize("hour")
  case object Day extends BatchSize("day")
  case object Month extends BatchSize("month")
  case object Year extends BatchSize("year")
  def parse(s: String): BatchSize = s match {
    case "hour" => Hour
    case "day" => Day
    case "month" => Month
    case "year" => Year
    case other => throw new IllegalArgumentException(s"unknown batch_size: $other")
  }
}

/** Node configuration (reference config.py:78-129 NodeConfig +
  * snapshot.py:11 SnapshotConfig + config.py:172 TestConfig, merged —
  * the reference also flattens these into one config dict per node).
  */
final case class NodeConfig(
    enabled: Boolean = true,
    materialized: Materialized = Materialized.View,
    incrementalStrategy: Option[String] = None, // append|merge|delete+insert|insert_overwrite|microbatch
    uniqueKey: Seq[String] = Nil,
    /** SQL predicates limiting which TARGET rows a merge may update
      * (reference config.py incremental_predicates — the warehouse-side
      * MERGE scan limiter; rows outside the predicates are never
      * touched, and at scale never even scanned).
      */
    incrementalPredicates: Seq[String] = Nil,
    onSchemaChange: String = "ignore", // ignore|fail|append_new_columns|sync_all_columns
    /** materialized_view redefinition policy (reference
      * config.py on_configuration_change): apply|continue|fail.
      */
    onConfigurationChange: String = "apply",
    fullRefresh: Option[Boolean] = None,
    // microbatch (reference config.py:83-85,128)
    eventTime: Option[String] = None,
    batchSize: Option[BatchSize] = None,
    lookback: Int = 1,
    begin: Option[java.time.Instant] = None,
    // snapshot (reference snapshot.py:11-77)
    strategy: Option[String] = None, // timestamp|check
    updatedAt: Option[String] = None,
    checkCols: Option[Seq[String]] = None, // None = "all"
    invalidateHardDeletes: Boolean = false,
    /** Open rows carry this timestamp in valid_to instead of NULL
      * (reference snapshot.py dbt_valid_to_current, dbt 1.9).
      */
    dbtValidToCurrent: Option[String] = None,
    /** Rename the four snapshot meta columns (reference
      * snapshot_meta_column_names, dbt 1.9); keys are the defaults.
      */
    snapshotMetaColumnNames: Map[String, String] = Map.empty,
    // test (reference config.py:172-181)
    severity: String = "error", // error|warn
    warnIf: String = "!= 0",
    errorIf: String = "!= 0",
    failCalc: String = "count(*)",
    limit: Option[Int] = None,
    storeFailures: Boolean = false,
    // common
    tags: Seq[String] = Nil,
    preHook: Seq[String] = Nil,
    postHook: Seq[String] = Nil,
    meta: Map[String, String] = Map.empty,
    schema: Option[String] = None,
    alias: Option[String] = None,
    partitionBy: Seq[String] = Nil,
    /** Bucketed (clustered) table layout: co-locates rows by key so
      * same-bucketed relations join without a shuffle (warehouse
      * CLUSTERED BY; Spark honors it via the session catalog).
      */
    bucketBy: Seq[String] = Nil,
    buckets: Int = 0,
    contractEnforced: Boolean = false,
    // governance (reference: group/access on ModelNode nodes.py:445;
    // versions manifest.py VERSIONED_NODE_TYPES)
    group: Option[String] = None,
    access: Option[String] = None, // public | protected | private
    version: Option[String] = None,
    /** Privilege → grantee roles (reference config.py grants; applied
      * post-materialization, full desired state each run).
      */
    grants: Map[String, Seq[String]] = Map.empty,
    /** persist_docs (reference config.py:86): `relation` → persist the
      * node description as a relation comment, `columns` → persist
      * column descriptions as column comments. Surfaced by
      * docs-generate's catalog.json, stored as relation metadata.
      */
    persistDocs: Map[String, Boolean] = Map.empty) {
  def persistRelationDocs: Boolean = persistDocs.getOrElse("relation", false)
  def persistColumnDocs: Boolean = persistDocs.getOrElse("columns", false)
}

/** Declared column info (reference components.py:59 ColumnInfo). */
final case class ColumnInfo(
    name: String,
    description: String = "",
    dataType: Option[String] = None,
    tests: Seq[TestSpec] = Nil,
    /** Declared constraints (reference components.py:39
      * ColumnLevelConstraint): (type, optional expression). not_null
      * and check are ENFORCED at materialization; unique/primary_key/
      * foreign_key are metadata-only (the reference's "not enforced"
      * support level on most adapters).
      */
    constraints: Seq[(String, Option[String])] = Nil)

/** A generic-test request attached to a column or model in schema YAML
  * (reference generic_test_builders.py:69 TestBuilder input).
  */
final case class TestSpec(
    testName: String, // unique | not_null | accepted_values | relationships | <custom>
    kwargs: Map[String, Any] = Map.empty,
    config: Map[String, String] = Map.empty)

/** File content hash for partial parsing / state:modified
  * (reference contracts/files.py:110 FileHash).
  */
final case class FileHash(checksum: String)
object FileHash {
  def of(content: String): FileHash = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    FileHash(md.digest(content.getBytes("UTF-8")).map("%02x".format(_)).mkString)
  }
}

/** Relation identity: database.schema.identifier
  * (reference components.py:133 HasRelationMetadata).
  */
final case class Relation(schema: String, identifier: String) {
  def fqn: String = s"$schema.$identifier"
}

/** Unit of work (reference nodes.py BaseNode subtypes). `uniqueId` is
  * "<type>.<package>.<name>" exactly like the reference.
  */
sealed trait Node extends Serializable {
  def uniqueId: String
  def name: String
  def packageName: String
  def config: NodeConfig
  def dependsOn: Seq[String]
  def resourceType: NodeType
  def checksum: FileHash
  def tags: Seq[String] = config.tags
  /** Doc text from schema YAML (reference ParsedNode.description) —
    * compared by state:modified.persisted_descriptions. */
  def description: String = ""
  /** Declared columns, where the node has any (docs + contract). */
  def declaredColumns: Seq[ColumnInfo] = Nil
}

/** SQL model (reference nodes.py:445 ModelNode). rawCode is the
  * templated SQL; compiledCode is filled by the Compiler.
  */
final case class ModelNode(
    name: String,
    packageName: String,
    rawCode: String,
    config: NodeConfig,
    dependsOn: Seq[String],
    refs: Seq[String],
    sources: Seq[(String, String)],
    columns: Seq[ColumnInfo] = Nil,
    path: String = "",
    checksum: FileHash = FileHash(""),
    override val description: String = "")
  extends Node {
  val uniqueId = s"model.$packageName.$name"
  val resourceType: NodeType = NodeType.Model
  override def declaredColumns: Seq[ColumnInfo] = columns
}

/** CSV seed (reference nodes.py:846 SeedNode). */
final case class SeedNode(
    name: String,
    packageName: String,
    csvPath: String,
    config: NodeConfig,
    columnTypes: Map[String, String] = Map.empty,
    delimiter: String = ",",
    checksum: FileHash = FileHash(""))
  extends Node {
  val uniqueId = s"seed.$packageName.$name"
  val resourceType: NodeType = NodeType.Seed
  val dependsOn: Seq[String] = Nil
}

/** SCD-2 snapshot (reference nodes.py:1076 SnapshotNode). */
final case class SnapshotNode(
    name: String,
    packageName: String,
    rawCode: String,
    config: NodeConfig,
    dependsOn: Seq[String],
    refs: Seq[String],
    sources: Seq[(String, String)] = Nil,
    checksum: FileHash = FileHash(""))
  extends Node {
  val uniqueId = s"snapshot.$packageName.$name"
  val resourceType: NodeType = NodeType.Snapshot
}

/** Compile-only analysis (reference nodes.py AnalysisNode,
  * parser/analysis.py:9): a SQL file under analyses/ that `compile`
  * renders but no command ever executes.
  */
final case class AnalysisNode(
    name: String,
    packageName: String,
    rawCode: String,
    config: NodeConfig,
    dependsOn: Seq[String],
    refs: Seq[String],
    sources: Seq[(String, String)] = Nil,
    checksum: FileHash = FileHash(""),
    path: String = "")
  extends Node {
  val uniqueId = s"analysis.$packageName.$name"
  val resourceType: NodeType = NodeType.Analysis
}

/** Data test node — generic (synthesized from YAML) or singular (a .sql
  * file) (reference nodes.py:973/:989).
  */
final case class TestNode(
    name: String,
    packageName: String,
    rawCode: String, // compiled-to-SQL test query returning failing rows
    config: NodeConfig,
    dependsOn: Seq[String],
    refs: Seq[String],
    attachedTo: Option[String] = None, // uniqueId of the tested node
    columnName: Option[String] = None,
    checksum: FileHash = FileHash(""),
    /** Originating file: the .sql for singular tests, the schema yml
      * for synthesized generic tests (reference original_file_path).
      */
    path: String = "")
  extends Node {
  val uniqueId = s"test.$packageName.$name"
  val resourceType: NodeType = NodeType.Test
}

/** Declared external table (reference nodes.py:1217 SourceDefinition). */
final case class SourceNode(
    sourceName: String,
    name: String,
    packageName: String,
    /** Where the data lives: a parquet path (or path template with
      * `{dir}`) or an existing relation name.
      */
    location: String,
    loadedAtField: Option[String] = None,
    freshnessWarnAfter: Option[java.time.Duration] = None,
    freshnessErrorAfter: Option[java.time.Duration] = None,
    filter: Option[String] = None,
    config: NodeConfig = NodeConfig(),
    columns: Seq[ColumnInfo] = Nil,
    /** File format of `location`: parquet (default) | csv | json | orc.
      * Reference SourceDefinition.external (source_definition.py) — the
      * "external table" escape hatch; Spark reads all of these natively.
      */
    format: Option[String] = None,
    /** Reader options (header, delimiter, multiLine, …). */
    options: Map[String, String] = Map.empty,
    checksum: FileHash = FileHash(""),
    /** The schema yml that declared this source (original_file_path). */
    path: String = "")
  extends Node {
  val uniqueId = s"source.$packageName.$sourceName.$name"
  val resourceType: NodeType = NodeType.Source
  val dependsOn: Seq[String] = Nil
  override def declaredColumns: Seq[ColumnInfo] = columns
}

/** Unit test with fixture rows (reference nodes.py:1025
  * UnitTestDefinition; formats unit_test_definition.py:25-67).
  */
final case class UnitTestNode(
    name: String,
    packageName: String,
    model: String, // tested model name
    givens: Map[String, Seq[Map[String, Any]]], // input ref/source name -> fixture rows
    expect: Seq[Map[String, Any]],
    config: NodeConfig = NodeConfig(),
    /** `format: sql` fixtures (reference UnitTestFormat.SQL): the input
      * (or expected output) is a SELECT evaluated at run time instead
      * of literal rows.
      */
    givenSql: Map[String, String] = Map.empty,
    expectSql: Option[String] = None,
    /** Per-test overrides (reference UnitTestOverrides,
      * unit_test_definition.py:40-44): `vars` shadow project vars and
      * `env_vars` shadow the process environment during this test's
      * render; `overrideCode` is the model body re-expanded with the
      * test's macro overrides (macros expand at parse time here, so the
      * override is baked into a per-test copy of the compiled text).
      */
    overrideVars: Map[String, String] = Map.empty,
    overrideEnv: Map[String, String] = Map.empty,
    overrideCode: Option[String] = None,
    checksum: FileHash = FileHash(""))
  extends Node {
  val uniqueId = s"unit_test.$packageName.$name"
  val resourceType: NodeType = NodeType.UnitTest
  val dependsOn: Seq[String] = Seq(s"model.$packageName.$model")
}

/** Downstream consumer of models — dashboards, ML jobs, notebooks
  * (reference nodes.py:1334 Exposure). Metadata-only: participates in
  * the graph and selection, never executed.
  */
final case class ExposureNode(
    name: String,
    packageName: String,
    exposureType: String, // dashboard | ml | notebook | application | analysis
    owner: String,
    dependsOn: Seq[String],
    config: NodeConfig = NodeConfig(),
    checksum: FileHash = FileHash(""))
  extends Node {
  val uniqueId = s"exposure.$packageName.$name"
  val resourceType: NodeType = NodeType.Exposure
}

/** Declared metric over a model (reference nodes.py:1404 Metric).
  * Metadata + a calculation expression; selectable, not executed.
  */
final case class MetricNode(
    name: String,
    packageName: String,
    calculation: String, // aggregate expression over the model
    model: String,
    dependsOn: Seq[String],
    config: NodeConfig = NodeConfig(),
    checksum: FileHash = FileHash(""))
  extends Node {
  val uniqueId = s"metric.$packageName.$name"
  val resourceType: NodeType = NodeType.Metric
}

/** Semantic-layer model over a base model (reference nodes.py
  * SemanticModel; semantic_models: in schema YAML). Metadata-only:
  * participates in the graph and selection, never executed.
  */
final case class SemanticModelNode(
    name: String,
    packageName: String,
    model: String, // ref target
    dependsOn: Seq[String],
    config: NodeConfig = NodeConfig(),
    checksum: FileHash = FileHash(""))
  extends Node {
  val uniqueId = s"semantic_model.$packageName.$name"
  val resourceType: NodeType = NodeType.SemanticModel
}

/** Saved query over semantic models (reference nodes.py SavedQuery;
  * saved_queries: in schema YAML). Metadata-only.
  */
final case class SavedQueryNode(
    name: String,
    packageName: String,
    dependsOn: Seq[String],
    config: NodeConfig = NodeConfig(),
    checksum: FileHash = FileHash(""))
  extends Node {
  val uniqueId = s"saved_query.$packageName.$name"
  val resourceType: NodeType = NodeType.SavedQuery
}

/** Project-level hook (reference nodes.py:438 HookNode, on-run-start/end). */
final case class HookNode(
    name: String,
    packageName: String,
    rawCode: String,
    index: Int,
    config: NodeConfig = NodeConfig(),
    checksum: FileHash = FileHash(""))
  extends Node {
  val uniqueId = s"operation.$packageName.$name"
  val resourceType: NodeType = NodeType.Operation
  val dependsOn: Seq[String] = Nil
}

/** The manifest IR (reference contracts/graph/manifest.py). */
/** A `{% materialization <name>, default %}` override block. The body
  * is a text-level reduction of the reference's materialization macro:
  * it renders with `{{ sql }}` (the compiled model SELECT, as a
  * subquery) and `{{ this }}` (the target relation) bound, and the
  * result is the SELECT the relation is built from — the same altitude
  * as the engine's text-level macro system.
  */
final case class MatOverride(
    name: String,
    body: String,
    packageName: String,
    /** Root-project overrides always win (reference Locality.Root is
      * always a valid locality); package (Imported) overrides of a
      * BUILTIN materialization are gated by the behavior flag.
      */
    fromRoot: Boolean)

object Manifest {
  /** Reference defaults for absent legacy behavior flags
    * (core/dbt/contracts/project.py:342-347).
    */
  val flagDefaults: Map[String, Boolean] = Map(
    "require_explicit_package_overrides_for_builtin_materializations" -> true)
}

final case class Manifest(
    nodes: Map[String, Node],
    sources: Map[String, SourceNode],
    unitTests: Map[String, UnitTestNode] = Map.empty,
    onRunStart: Seq[HookNode] = Nil,
    onRunEnd: Seq[HookNode] = Nil,
    projectName: String = "graft",
    /** node uniqueId -> macro names its raw code calls, transitively
      * closed through macro bodies (reference depends_on.macros). */
    macroDeps: Map[String, Seq[String]] = Map.empty,
    /** macro name -> content checksum (reference Macro.checksum;
      * feeds state:modified.macros). */
    macroSums: Map[String, String] = Map.empty,
    /** Project-level behavior flags (reference ProjectFlags,
      * core/dbt/contracts/project.py:318-346, the `flags:` block of
      * dbt_project.yml). String-valued as parsed; read via [[flag]].
      */
    flags: Map[String, String] = Map.empty,
    /** node uniqueId -> var name -> resolved value, for every var()
      * the node's macro-expanded text references — the comparison
      * basis for the `state_modified_compare_vars` behavior flag.
      */
    varsUsed: Map[String, Map[String, String]] = Map.empty,
    /** `{% materialization name, default %}` override blocks by
      * materialization name (reference macro namespace Locality:
      * Core = the engine's built-ins, Root = the root project,
      * Imported = a dependency package). Dispatch is gated by the
      * `require_explicit_package_overrides_for_builtin_materializations`
      * behavior flag (manifest.py:1015-1036).
      */
    matOverrides: Map[String, MatOverride] = Map.empty,
    /** node uniqueId -> config key -> UNRENDERED value text: the
      * node's config as written (yml defaults + the file's config()
      * call scanned from macro-expanded but var/control-flow-UNRENDERED
      * text). The `state_modified_compare_more_unrendered_values`
      * comparison basis (reference unrendered_config,
      * context_config.py:315-335): under the flag, state:modified
      * compares these instead of the rendered config, so a var/env
      * rendering difference alone no longer reads as modified.
      */
    unrenderedConfigs: Map[String, Map[String, String]] = Map.empty) {

  /** A behavior flag's boolean value. Absent flags take the
    * REFERENCE's per-flag default (core/dbt/contracts/project.py:342-
    * 347): every legacy behavior flag defaults false except
    * require_explicit_package_overrides_for_builtin_materializations,
    * which the reference flipped to true.
    */
  def flag(name: String): Boolean =
    flags.get(name).map(_.equalsIgnoreCase("true"))
      .getOrElse(Manifest.flagDefaults.getOrElse(name, false))

  def all: Map[String, Node] = nodes ++ sources ++ unitTests

  def get(uniqueId: String): Option[Node] = all.get(uniqueId)

  /** child -> parents edge map (reference manifest parent_map). */
  def parentMap: Map[String, Seq[String]] =
    all.map { case (id, n) => id -> n.dependsOn }

  /** parent -> children (reference manifest child_map). */
  def childMap: Map[String, Seq[String]] = {
    val pairs = for ((id, n) <- all.toSeq; p <- n.dependsOn) yield (p, id)
    pairs.groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2) }
  }

  /** Resolve ref('name') → node (reference manifest.py:1338). Accepts
    * the canonical spec encoding too (`pkg/name@vN`).
    */
  def resolveRef(name: String): Option[Node] = resolveRefSpec(name)

  /** Resolve a canonical ref spec `[pkg/]name[@vN]` (reference
    * providers.py:260-305 RuntimeRefResolver + VERSIONED_NODE_TYPES,
    * node_types.py:33): package restricts the search; an explicit
    * version picks that version of the family; a bare name prefers the
    * exact-name match and otherwise resolves to the LATEST version of a
    * versioned family (files named `<base>_v<N>.sql` with
    * config(version=N), the reference's versioned-model convention).
    */
  def resolveRefSpec(spec: String, callerPkg: Option[String] = None): Option[Node] = {
    val (pkg, rest) = spec.indexOf('/') match {
      case -1 => (None, spec)
      case i => (Some(spec.take(i)), spec.drop(i + 1))
    }
    val (nm, ver) = rest.lastIndexOf("@v") match {
      case -1 => (rest, None)
      case i => (rest.take(i), Some(rest.drop(i + 2)))
    }
    def base(n: Node): String =
      n.config.version.fold(n.name)(v => n.name.stripSuffix(s"_v$v"))
    // resolution is deterministic: the caller's own package wins on a
    // name collision across merged packages (reference resolve_ref
    // package preference), then uniqueId order breaks remaining ties
    def pick(xs: Seq[Node]): Option[Node] =
      xs.find(n => callerPkg.contains(n.packageName))
        .orElse(xs.sortBy(_.uniqueId).headOption)
    val cands = nodes.values
      .filter(n => NodeType.refable(n.resourceType))
      .filter(n => pkg.forall(_ == n.packageName)).toSeq
    ver match {
      case Some(v) =>
        pick(cands.filter(n => n.config.version.contains(v) && (base(n) == nm || n.name == nm)))
      case None =>
        pick(cands.filter(_.name == nm)).orElse {
          val family0 = cands.filter(n => n.config.version.nonEmpty && base(n) == nm)
          // caller's package owns its versioned family on a collision
          val own = family0.filter(n => callerPkg.contains(n.packageName))
          val family = if (own.nonEmpty) own else family0
          if (family.isEmpty) None
          else Some(family.maxBy(n =>
            (n.config.version.flatMap(_.toIntOption).getOrElse(0), n.uniqueId)))
        }
    }
  }

  /** Resolve source('src','table') (reference manifest.py:1375). */
  def resolveSource(sourceName: String, tableName: String): Option[SourceNode] =
    sources.values.find(s => s.sourceName == sourceName && s.name == tableName)
}
