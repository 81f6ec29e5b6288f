package graft

import graft.core.GtsValue
import graft.parsers.PromParser
import org.scalatest.funsuite.AnyFunSuite

/** Prometheus exposition + remote-write cases (reference
  * catalyser/prometheus.go, prometheus_remote_write.go; FIXTURES.md §A.4-5).
  */
class PromParserSpec extends AnyFunSuite {
  private val nowMs = 1706659200000L

  test("exposition: counter lines with and without ts, comments skipped") {
    val body =
      """# TYPE http_requests_total counter
        |http_requests_total{method="post",code="200"} 1027 1395066363000
        |http_requests_total{method="post",code="400"} 3
        |""".stripMargin
    val gts = PromParser.parseExposition(body, Map.empty, nowMs).toOption.get
    assert(gts.size == 2)
    assert(gts(0).name == "http_requests_total")
    assert(gts(0).labels == Map("method" -> "post", "code" -> "200"))
    assert(gts(0).ts.contains(1395066363000000L)) // ms -> µs
    assert(gts(0).value == GtsValue.double(1027.0))
    assert(gts(1).ts.contains(nowMs * 1000L)) // now injected
  }

  test("±Inf dropped, NaN KEPT (prometheus.go:83-85 checks only Inf)") {
    val body = "bad_inf +Inf\nbad_neginf -Inf\nnan_metric NaN\nok 1"
    val gts = PromParser.parseExposition(body, Map.empty, nowMs).toOption.get
    assert(gts.map(_.name) == Seq("nan_metric", "ok"))
    assert(gts.head.value.asInstanceOf[GtsValue.GtsDouble].v.isNaN)
  }

  test("__name__ label overrides the line name and is removed from labels") {
    val body = """m{__name__="real_name",a="b"} 1 1000"""
    val gts = PromParser.parseExposition(body, Map.empty, nowMs).toOption.get
    assert(gts.head.name == "real_name")
    assert(gts.head.labels == Map("a" -> "b"))
  }

  test("extra labels (URL path) override inner labels (prometheus.go:96-99)") {
    val body = """m{job="inner",a="b"} 1 1000"""
    val gts = PromParser.parseExposition(body, Map("job" -> "outer"), nowMs).toOption.get
    assert(gts.head.labels == Map("job" -> "outer", "a" -> "b"))
  }

  test("label value escapes") {
    val body = """m{a="q\"uote",b="back\\slash",c="new\nline"} 1 1000"""
    val gts = PromParser.parseExposition(body, Map.empty, nowMs).toOption.get
    assert(gts.head.labels == Map("a" -> "q\"uote", "b" -> "back\\slash", "c" -> "new\nline"))
  }

  test("path labels: pairs; odd count -> error (prometheus.go:26-38)") {
    assert(PromParser.pathLabels("/job/demo/instance/local") ==
      Right(Map("job" -> "demo", "instance" -> "local")))
    assert(PromParser.pathLabels("/job/demo/odd").isLeft)
    assert(PromParser.pathLabels("") == Right(Map.empty))
  }

  test("remote_write: non-finite COERCED TO 0, not dropped (remote_write.go:70-73)") {
    val labels = Map("__name__" -> "up", "job" -> "node")
    val g1 = PromParser.normalizeRemoteWriteSample(labels, 1.0, 1346846400000L)
    val g2 = PromParser.normalizeRemoteWriteSample(labels, Double.PositiveInfinity, 1346846401000L)
    val g3 = PromParser.normalizeRemoteWriteSample(labels, Double.NaN, 1346846402000L)
    assert(Seq(g1, g2, g3).map(_.value) ==
      Seq(GtsValue.double(1.0), GtsValue.double(0.0), GtsValue.double(0.0)))
    assert(g1.name == "up" && g1.labels == Map("job" -> "node"))
    assert(g1.ts.contains(1346846400000000L)) // ms×1000 -> µs
  }

  test("malformed exposition line -> error") {
    assert(PromParser.parseExposition("{no_name} 1", Map.empty, nowMs).isLeft)
    assert(PromParser.parseExposition("m notanumber", Map.empty, nowMs).isLeft)
  }

  test("timestamp beyond Long range -> Left, not an escaped exception") {
    assert(PromParser.parseExposition("m 1 99999999999999999999", Map.empty, nowMs).isLeft)
  }
}
