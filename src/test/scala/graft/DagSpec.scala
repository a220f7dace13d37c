package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.graph._

class DagSpec extends AnyFunSuite {
  def model(name: String, deps: Seq[String] = Nil, tags: Seq[String] = Nil): ModelNode =
    ModelNode(name, "p", s"select 1", NodeConfig(tags = tags),
      deps.map(d => s"model.p.$d"), Nil, Nil, checksum = FileHash.of(name))

  def manifestOf(ms: ModelNode*): Manifest =
    Manifest(ms.map(m => m.uniqueId -> (m: Node)).toMap, Map.empty)

  test("link + cycle detection") {
    val m = manifestOf(model("a"), model("b", Seq("a")), model("c", Seq("b")))
    val g = Linker.link(m)
    assert(g.descendants("model.p.a") == Set("model.p.b", "model.p.c"))
    assert(g.ancestors("model.p.c") == Set("model.p.a", "model.p.b"))

    val cyc = manifestOf(model("a", Seq("b")), model("b", Seq("a")))
    assertThrows[IllegalStateException](Linker.link(cyc))
  }

  test("queue hands out nodes in dependency order with level scores") {
    val m = manifestOf(model("a"), model("b", Seq("a")), model("c", Seq("a")), model("d", Seq("b", "c")))
    val g = Linker.link(m)
    val q = new GraphQueue(g, m.nodes.keySet)
    assert(q.scores("model.p.a") == 0)
    assert(q.scores("model.p.d") == 2)
    val first = q.nextReady().get
    assert(first == "model.p.a")
    assert(q.nextReady().isEmpty) // b/c blocked until a done
    q.markDone(first)
    val second = q.nextReady().get
    val third = q.nextReady().get
    assert(Set(second, third) == Set("model.p.b", "model.p.c"))
    q.markDone(second); q.markDone(third)
    assert(q.nextReady().contains("model.p.d"))
  }

  test("failure skips descendants") {
    val m = manifestOf(model("a"), model("b", Seq("a")), model("c", Seq("b")))
    val q = new GraphQueue(Linker.link(m), m.nodes.keySet)
    val a = q.nextReady().get
    val skipped = q.markFailed(a)
    assert(skipped == Set("model.p.b", "model.p.c"))
    assert(q.isComplete)
  }

  test("selector: fqn, tag, graph operators, exclusion") {
    val m = manifestOf(
      model("raw"), model("stg", Seq("raw"), tags = Seq("staging")),
      model("mart", Seq("stg")), model("other"))
    val g = Linker.link(m)
    def sel(s: String*) = Selector.select(m, g, s)
    assert(sel("stg") == Set("model.p.stg"))
    assert(sel("tag:staging") == Set("model.p.stg"))
    assert(sel("stg+") == Set("model.p.stg", "model.p.mart"))
    assert(sel("+stg") == Set("model.p.raw", "model.p.stg"))
    assert(sel("1+mart") == Set("model.p.stg", "model.p.mart"))
    assert(sel("@stg") == Set("model.p.raw", "model.p.stg", "model.p.mart"))
    assert(sel("stg*") == Set("model.p.stg"))
    assert(Selector.select(m, g, Seq("tag:staging+"), Seq("mart")) == Set("model.p.stg"))
    // intersection
    assert(Selector.select(m, g, Seq("tag:staging,stg")) == Set("model.p.stg"))
  }

  test("state:modified picks up checksum and config drift") {
    val a1 = model("a"); val b1 = model("b")
    val old = manifestOf(a1, b1)
    val a2 = a1.copy(rawCode = "select 2", checksum = FileHash.of("select 2"))
    val b2 = b1.copy(config = b1.config.copy(tags = Seq("x")))
    val cur = manifestOf(a2, b2)
    assert(Selector.modified(cur, old) == Set("model.p.a", "model.p.b"))
    assert(Selector.modified(old, old) == Set.empty)
  }

  test("state submethods: new/old/unmodified and the modified.* family") {
    import graft.graph.StateView
    val a1 = model("a"); val b1 = model("b"); val c1 = model("c"); val d1 = model("d")
    val old = StateView.of(manifestOf(a1, b1, c1, d1).copy(
      macroDeps = Map("model.p.d" -> Seq("fmt")),
      macroSums = Map("fmt" -> "sum_v1")))
    val a2 = a1.copy(rawCode = "select 2", checksum = FileHash.of("select 2")) // body
    val b2 = b1.copy(config = b1.config.copy(schema = Some("alt")))           // relation+config
    val c2 = c1.copy(                                                          // docs + contract
      description = "documented",
      columns = Seq(ColumnInfo("id", "the id", Some("bigint"))))
    val cur = manifestOf(a2, b2, c2, d1, model("e")).copy(                     // e is new
      macroDeps = Map("model.p.d" -> Seq("fmt")),
      macroSums = Map("fmt" -> "sum_v2"))                                      // macro edited
    def st(v: String) = Selector.stateMatch(v, cur, old)
    assert(st("new") == Set("model.p.e"))
    assert(st("old") == Set("model.p.a", "model.p.b", "model.p.c", "model.p.d"))
    assert(st("modified.body") == Set("model.p.a", "model.p.e"))
    assert(st("modified.configs").contains("model.p.b"))
    assert(!st("modified.configs").contains("model.p.a"))
    assert(st("modified.relation") == Set("model.p.b", "model.p.e"))
    assert(st("modified.persisted_descriptions") == Set("model.p.c", "model.p.e"))
    assert(st("modified.contract") == Set("model.p.c", "model.p.e"))
    assert(st("modified.macros") == Set("model.p.d"))
    assert(st("modified") ==
      Set("model.p.a", "model.p.b", "model.p.c", "model.p.d", "model.p.e"))
    assert(st("unmodified") == Set.empty)
    // a state round-trip through JSON text is identical to the in-memory view
    val dir = java.nio.file.Files.createTempDirectory("state_rt")
    graft.artifacts.Artifacts.writeManifest(dir.toString, manifestOf(a1, b1, c1, d1))
    val fromDisk = StateView.read(dir.resolve("manifest.json").toString)
    assert(Selector.stateMatch("modified", manifestOf(a1, b1, c1, d1), fromDisk) == Set.empty)
  }

  test("indirect test selection modes") {
    val a = model("a"); val b = model("b")
    val t = TestNode("t_ab", "p", "select 1", NodeConfig(),
      Seq("model.p.a", "model.p.b"), Nil, checksum = FileHash.of("t"))
    val m = Manifest((Seq(a, b).map(x => x.uniqueId -> (x: Node)) :+
      (t.uniqueId -> (t: Node))).toMap, Map.empty)
    val g = Linker.link(m)
    // eager: any dep selected
    assert(Selector.expandIndirect(m, g, Set("model.p.a"), "eager").contains("test.p.t_ab"))
    // cautious: all deps must be selected
    assert(!Selector.expandIndirect(m, g, Set("model.p.a"), "cautious").contains("test.p.t_ab"))
    assert(Selector.expandIndirect(m, g, Set("model.p.a", "model.p.b"), "cautious")
      .contains("test.p.t_ab"))
    assert(!Selector.expandIndirect(m, g, Set("model.p.a"), "empty").contains("test.p.t_ab"))
  }
}

class MicrobatchSpec extends AnyFunSuite {
  import java.time.Instant
  import graft.exec.Microbatch
  import graft.core.BatchSize

  def i(s: String): Instant = Instant.parse(s)

  test("truncate matches reference docstring examples (microbatch.py:142)") {
    val ts = i("2024-09-17T16:06:00Z")
    assert(Microbatch.truncate(ts, BatchSize.Hour) == i("2024-09-17T16:00:00Z"))
    assert(Microbatch.truncate(ts, BatchSize.Day) == i("2024-09-17T00:00:00Z"))
    assert(Microbatch.truncate(ts, BatchSize.Month) == i("2024-09-01T00:00:00Z"))
    assert(Microbatch.truncate(ts, BatchSize.Year) == i("2024-01-01T00:00:00Z"))
  }

  test("offset matches reference docstring examples (microbatch.py:100)") {
    val ts = i("2024-09-17T16:06:00Z")
    assert(Microbatch.offset(ts, BatchSize.Hour, -1) == i("2024-09-17T15:00:00Z"))
    assert(Microbatch.offset(ts, BatchSize.Hour, 1) == i("2024-09-17T17:00:00Z"))
    assert(Microbatch.offset(ts, BatchSize.Day, -1) == i("2024-09-16T00:00:00Z"))
    assert(Microbatch.offset(ts, BatchSize.Day, 1) == i("2024-09-18T00:00:00Z"))
    assert(Microbatch.offset(ts, BatchSize.Month, -1) == i("2024-08-01T00:00:00Z"))
    assert(Microbatch.offset(ts, BatchSize.Month, 1) == i("2024-10-01T00:00:00Z"))
    assert(Microbatch.offset(ts, BatchSize.Year, -1) == i("2023-01-01T00:00:00Z"))
    assert(Microbatch.offset(ts, BatchSize.Year, 1) == i("2025-01-01T00:00:00Z"))
  }

  test("end-of-day +1 day is one second later (microbatch.py:106-108)") {
    assert(Microbatch.offset(i("2024-09-17T23:59:59Z"), BatchSize.Day, 1) ==
      i("2024-09-18T00:00:00Z"))
  }

  test("boundary-straddle checkpoint widens lookback by one (microbatch.py:69-74)") {
    // checkpoint exactly on a day boundary, lookback 1 → start 2 days back
    val onBoundary = Microbatch.buildStartTime(
      Some(i("2024-05-10T00:00:00Z")), isIncremental = true, None, BatchSize.Day, 1)
    assert(onBoundary == i("2024-05-08T00:00:00Z"))
    // mid-batch checkpoint, lookback 1 → previous day
    val midBatch = Microbatch.buildStartTime(
      Some(i("2024-05-10T12:00:00Z")), isIncremental = true, None, BatchSize.Day, 1)
    assert(midBatch == i("2024-05-09T00:00:00Z"))
  }

  test("first run uses truncated begin") {
    val s = Microbatch.buildStartTime(None, isIncremental = false,
      Some(i("2024-01-15T07:30:00Z")), BatchSize.Month, 1)
    assert(s == i("2024-01-01T00:00:00Z"))
  }

  test("build_batches clamps final batch to end (microbatch.py:95-96)") {
    val batches = Microbatch.buildBatches(
      i("2024-01-01T00:00:00Z"), i("2024-01-03T10:30:00Z"), BatchSize.Day)
    assert(batches == Seq(
      (i("2024-01-01T00:00:00Z"), i("2024-01-02T00:00:00Z")),
      (i("2024-01-02T00:00:00Z"), i("2024-01-03T00:00:00Z")),
      (i("2024-01-03T00:00:00Z"), i("2024-01-03T10:30:00Z"))))
  }
}
