package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.parser.PartialParse

class PartialParseSpec extends AnyFunSuite {
  test("cache hit when nothing changed; invalidated on file edit and var change") {
    val dir = Files.createTempDirectory("pp_proj")
    val target = dir.resolve("target").toString
    Files.createDirectories(dir.resolve("models"))
    Files.writeString(dir.resolve("dbt_project.yml"), "name: pp\n")
    Files.writeString(dir.resolve("models/m1.sql"), "select 1 as id\n")

    val (p1, hit1) = PartialParse.loadCached(dir.toString, Map.empty, target)
    assert(!hit1)
    assert(p1.manifest.nodes.contains("model.pp.m1"))

    val (p2, hit2) = PartialParse.loadCached(dir.toString, Map.empty, target)
    assert(hit2)
    assert(p2.manifest.nodes.keySet == p1.manifest.nodes.keySet)
    assert(p2.manifest.nodes("model.pp.m1").checksum == p1.manifest.nodes("model.pp.m1").checksum)

    // file edit invalidates
    Files.writeString(dir.resolve("models/m1.sql"), "select 2 as id\n")
    val (p3, hit3) = PartialParse.loadCached(dir.toString, Map.empty, target)
    assert(!hit3)
    assert(p3.manifest.nodes("model.pp.m1").checksum != p1.manifest.nodes("model.pp.m1").checksum)

    // var change invalidates
    val (_, hit4) = PartialParse.loadCached(dir.toString, Map("x" -> "1"), target)
    assert(!hit4)
  }

  test("parse bench project loads well under the baseline target") {
    val sec = Bench.parse2000Bench()
    // reference baselines: 41-72 s; target ≤ 90 s; JVM static parse ≪ 10 s
    assert(sec < 30.0, s"parse took $sec s")
  }
}
