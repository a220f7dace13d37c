package graft.graph

import scala.collection.mutable

import graft.core._

/** Driver-side DAG over manifest nodes (reference: networkx DiGraph in
  * core/dbt/compilation.py:124 Linker; graph ops core/dbt/graph/graph.py).
  * Node counts are ~10³-10⁴ — plain Scala collections, no Spark.
  */
final class Digraph(val nodes: Set[String], val edges: Set[(String, String)]) {
  /** parent -> children */
  val children: Map[String, Set[String]] =
    edges.groupBy(_._1).map { case (p, es) => p -> es.map(_._2) }.withDefaultValue(Set.empty)
  /** child -> parents */
  val parents: Map[String, Set[String]] =
    edges.groupBy(_._2).map { case (c, es) => c -> es.map(_._1) }.withDefaultValue(Set.empty)

  def ancestors(id: String, maxDepth: Int = Int.MaxValue): Set[String] =
    walk(id, parents, maxDepth)
  def descendants(id: String, maxDepth: Int = Int.MaxValue): Set[String] =
    walk(id, children, maxDepth)

  private def walk(id: String, next: Map[String, Set[String]], maxDepth: Int): Set[String] = {
    val seen = mutable.Set[String]()
    var frontier = next(id)
    var depth = 0
    while (frontier.nonEmpty && depth < maxDepth) {
      val fresh = frontier -- seen
      seen ++= fresh
      frontier = fresh.flatMap(next)
      depth += 1
    }
    seen.toSet
  }

  /** First cycle found, if any (reference Linker.find_cycles,
    * compilation.py:132).
    */
  def findCycle(): Option[Seq[String]] = {
    val color = mutable.Map[String, Int]().withDefaultValue(0) // 0 white 1 grey 2 black
    val stack = mutable.ArrayBuffer[String]()
    def dfs(u: String): Option[Seq[String]] = {
      color(u) = 1
      stack += u
      for (v <- children(u)) {
        if (color(v) == 1) return Some(stack.toSeq.dropWhile(_ != v) :+ v)
        if (color(v) == 0) dfs(v) match { case s @ Some(_) => return s; case None => }
      }
      stack.remove(stack.length - 1)
      color(u) = 2
      None
    }
    nodes.toSeq.sorted.foreach { n =>
      if (color(n) == 0) dfs(n) match { case s @ Some(_) => return s; case None => }
    }
    None
  }

  /** Subgraph restricted to `keep` (edges contract through removed
    * nodes so lineage survives, like networkx transitive reduction in
    * the reference's selector).
    */
  def subgraph(keep: Set[String]): Digraph = {
    // contract: connect each kept node to its nearest kept ancestors
    val keptEdges = mutable.Set[(String, String)]()
    for (n <- keep) {
      // BFS up through dropped nodes to the first kept ancestor(s)
      val seen = mutable.Set[String]()
      var frontier = parents(n)
      while (frontier.nonEmpty) {
        val (inKeep, dropped) = frontier.partition(keep)
        keptEdges ++= inKeep.map(p => (p, n))
        seen ++= frontier
        frontier = dropped.flatMap(parents) -- seen
      }
    }
    new Digraph(keep, keptEdges.toSet)
  }
}

object Linker {
  /** Build graph from dependsOn edges; raise on cycle (reference
    * Linker.link_graph, compilation.py:176-196).
    */
  def link(manifest: Manifest): Digraph = {
    val ids = manifest.all.keySet
    val edges = for {
      (id, node) <- manifest.all.toSet
      dep <- node.dependsOn
      if ids.contains(dep)
    } yield (dep, id)
    val g = new Digraph(ids, edges)
    g.findCycle().foreach { cyc =>
      throw new IllegalStateException(s"Found a cycle: ${cyc.mkString(" -> ")}")
    }
    g
  }

  /** Test-edge augmentation for `build`: downstream models wait on
    * upstream tests when every test dependency is already an ancestor
    * (reference add_test_edges, compilation.py:197-250).
    */
  def addTestEdges(g: Digraph, manifest: Manifest): Digraph = {
    val extra = mutable.Set[(String, String)]()
    for ((tid, t) <- manifest.nodes if t.resourceType == NodeType.Test) {
      val tested = t.dependsOn.toSet
      // every non-test child of the tested nodes should wait on this test,
      // provided the test's other deps don't create a cycle
      for (parent <- tested; child <- g.children(parent)
           if child != tid && !manifest.nodes.get(child).exists(_.resourceType == NodeType.Test)) {
        val wouldCycle = g.ancestors(tid).contains(child) || child == tid
        if (!wouldCycle && (tested - parent).forall(d => g.ancestors(child).contains(d)))
          extra += ((tid, child))
      }
    }
    new Digraph(g.nodes, g.edges ++ extra)
  }
}

/** Priority queue handing out nodes whose deps are complete, scored by
  * topological level (reference GraphQueue, core/dbt/graph/queue.py:19;
  * scores queue.py:97 _get_scores). Thread-safe: the Runner's worker
  * pool calls markDone/nextReady concurrently.
  */
final class GraphQueue(graph: Digraph, selected: Set[String]) {
  private val g = graph.subgraph(selected)
  /** topological level = 1 + max(level of parents) (root = 0). */
  val scores: Map[String, Int] = {
    val memo = mutable.Map[String, Int]()
    def level(n: String): Int = memo.getOrElseUpdate(n,
      if (g.parents(n).isEmpty) 0 else g.parents(n).map(level).max + 1)
    g.nodes.foreach(level)
    memo.toMap
  }

  private val done = mutable.Set[String]()
  private val inFlight = mutable.Set[String]()

  def isComplete: Boolean = synchronized { done.size == g.nodes.size }

  /** Pop the ready node with the lowest (score, id), if any. */
  def nextReady(): Option[String] = synchronized {
    val ready = g.nodes.view
      .filterNot(done)
      .filterNot(inFlight)
      .filter(n => g.parents(n).forall(done))
    if (ready.isEmpty) None
    else {
      val n = ready.minBy(n => (scores(n), n))
      inFlight += n
      Some(n)
    }
  }

  def markDone(n: String): Unit = synchronized {
    inFlight -= n
    done += n
    notifyAll()
  }

  /** Mark a node failed: it and all its descendants are skipped
    * (reference mark_as_skipped semantics in runnable.py).
    */
  def markFailed(n: String): Set[String] = synchronized {
    inFlight -= n
    done += n
    val skipped = g.descendants(n) -- done
    done ++= skipped
    notifyAll()
    skipped
  }

  /** fail-fast: mark every node that hasn't started as done and return
    * that set (reference --fail-fast, runnable.py FailFast handling —
    * in-flight nodes finish, nothing new is scheduled).
    */
  def abort(): Set[String] = synchronized {
    val remaining = g.nodes.toSet -- done -- inFlight
    done ++= remaining
    notifyAll()
    remaining
  }

  /** Block until a node is ready or everything is complete. */
  def awaitReady(): Option[String] = synchronized {
    var r = nextReady()
    while (r.isEmpty && !isComplete && inFlight.nonEmpty) {
      wait(100)
      r = nextReady()
    }
    r
  }
}
