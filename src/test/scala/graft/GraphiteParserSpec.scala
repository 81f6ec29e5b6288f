package graft

import graft.core.{Gts, GtsValue}
import graft.parsers.GraphiteParser
import org.scalatest.funsuite.AnyFunSuite

/** Table-driven graphite parser cases (reference catalyser/graphite.go:314-407;
  * samples FIXTURES.md §A.2).
  */
class GraphiteParserSpec extends AnyFunSuite {
  private val nowMs = 1706659200000L // fixed

  private def parse(line: String, hier: Boolean = true) =
    GraphiteParser.parseLine(line, hier, nowMs).fold(e => fail(s"parse failed: $e"), identity)

  test("value inference: float needs a dot") {
    assert(parse("m 14.2 1546420308000").value == GtsValue.double(14.2))
    assert(parse("m 42 1546420308000").value == GtsValue.long(42))
    assert(parse("m 1e5 1546420308000").value == GtsValue.string("1e5")) // no dot -> not float
    assert(parse("m 1.5e3 1546420308000").value == GtsValue.double(1500.0))
  }

  test("value inference: bool only for case-insensitive true/false") {
    assert(parse("m true").value == GtsValue.bool(true))
    assert(parse("m False").value == GtsValue.bool(false))
    assert(parse("m TRUE").value == GtsValue.bool(true))
    assert(parse("m t").value == GtsValue.string("t")) // Go uses ToLower=="true", NOT ParseBool
    assert(parse("m hello").value == GtsValue.string("hello"))
  }

  test("timestamp heuristic boundaries at 0xFFFFFFFF (strictly less = seconds)") {
    assert(parse("m 1 4294967294").ts.contains(4294967294L * 1000000L)) // seconds
    assert(parse("m 1 4294967295").ts.contains(4294967295L * 1000L))   // millis
    assert(parse("m 1 1546420308").ts.contains(1546420308000000L))     // seconds
    assert(parse("m 1 1546420308000").ts.contains(1546420308000000L))  // millis
  }

  test("ts = 0 and missing ts -> now") {
    assert(parse("m 1 0").ts.contains(nowMs * 1000L))
    assert(parse("m 1").ts.contains(nowMs * 1000L))
  }

  test("hierarchy labels with parse=true, both with and without tags") {
    assert(parse("sys.cpu.user 0.5").labels == Map("0" -> "sys", "1" -> "cpu", "2" -> "user"))
    val g = parse("sys.cpu.user;host=web01;dc=lga 42 1546420308")
    assert(g.name == "sys.cpu.user")
    assert(g.labels == Map("0" -> "sys", "1" -> "cpu", "2" -> "user",
      "host" -> "web01", "dc" -> "lga"))
  }

  test("tags override hierarchy labels on key collision") {
    val g = parse("a.b;0=custom 1")
    assert(g.labels == Map("0" -> "custom", "1" -> "b"))
  }

  test("parse=false -> no hierarchy labels") {
    assert(parse("sys.cpu.user 0.5", hier = false).labels.isEmpty)
  }

  test("errors: too few tokens, bad timestamp, bad tag") {
    assert(GraphiteParser.parseLine("justname", true, nowMs).isLeft)
    assert(GraphiteParser.parseLine("m 1 notanum", true, nowMs).isLeft)
    assert(GraphiteParser.parseLine("m;badtag 1", true, nowMs).isLeft)
  }

  test("Go single-space split: double space makes an empty value token -> string") {
    // strings.Split(line, " ") yields an empty token; the cascade makes it a string
    val g = parse("m  1546420308")
    assert(g.value == GtsValue.string(""))
  }

  test("TCP token prefix extraction (graphite.go:240-267)") {
    assert(GraphiteParser.extractTcpToken("TOKEN@.tcp_metric 14.2") == Some(("TOKEN", 7)))
    assert(GraphiteParser.extractTcpToken("no_token_line 1") == None)
  }
}
