package graft

import graft.core.GtsValue
import graft.parsers.OpenTsdbParser
import org.scalatest.funsuite.AnyFunSuite

/** OpenTSDB JSON put cases (reference catalyser/opentsdb.go; samples
  * FIXTURES.md §A.3).
  */
class OpenTsdbParserSpec extends AnyFunSuite {
  private val nowUs = 1706659200000000L

  test("single object (doc example)") {
    val body = """{"metric": "sys.cpu.nice", "timestamp": 1346846400, "value": 18,
      "tags": {"host": "web01", "dc": "lga"}}"""
    val gts = OpenTsdbParser.parse(body, nowUs).toOption.get
    assert(gts.size == 1)
    assert(gts.head.name == "sys.cpu.nice")
    assert(gts.head.ts.contains(1346846400000000L)) // seconds heuristic
    assert(gts.head.value == GtsValue.double(18.0)) // Go json: numbers -> float64
    assert(gts.head.labels == Map("host" -> "web01", "dc" -> "lga"))
  }

  test("array of objects") {
    val body = """[{"metric":"a","timestamp":1346846400,"value":1,"tags":{}},
      {"metric":"b","timestamp":1346846400123,"value":2.5,"tags":{"x":"y"}}]"""
    val gts = OpenTsdbParser.parse(body, nowUs).toOption.get
    assert(gts.map(_.name) == Seq("a", "b"))
    assert(gts(1).ts.contains(1346846400123000L)) // >= 0xFFFFFFFF -> millis
  }

  test("leading junk bytes before the first bracket are discarded (opentsdb.go:37-58)") {
    val gts = OpenTsdbParser.parse("""  \r\n junk{"metric":"m","timestamp":0,"value":1,"tags":{}}""", nowUs)
    assert(gts.toOption.get.head.name == "m")
    assert(gts.toOption.get.head.ts.contains(nowUs)) // ts=0 -> now
  }

  test("string and bool values") {
    val g1 = OpenTsdbParser.parse("""{"metric":"m","timestamp":1,"value":"hi","tags":{}}""", nowUs)
    assert(g1.toOption.get.head.value == GtsValue.string("hi"))
    val g2 = OpenTsdbParser.parse("""{"metric":"m","timestamp":1,"value":true,"tags":{}}""", nowUs)
    assert(g2.toOption.get.head.value == GtsValue.bool(true))
  }

  test("missing tags -> empty labels; malformed json -> error") {
    val g = OpenTsdbParser.parse("""{"metric":"m","timestamp":1,"value":1}""", nowUs)
    assert(g.toOption.get.head.labels.isEmpty)
    assert(OpenTsdbParser.parse("""{"metric": oops}""", nowUs).isLeft)
    assert(OpenTsdbParser.parse("no json here", nowUs).isLeft)
  }
}
