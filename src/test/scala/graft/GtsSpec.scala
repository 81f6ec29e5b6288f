package graft

import graft.core.{Gts, GtsRow, GtsValue}
import org.scalatest.funsuite.AnyFunSuite

/** Timestamp heuristic boundaries (catalyser/opentsdb.go:127-144) and the
  * tagged-union row mapping (SURVEY.md §7.4).
  */
class GtsSpec extends AnyFunSuite {
  private val nowUs = 1706659200000000L

  test("normalizeEpochUs: 0 -> now; < 0xFFFFFFFF -> seconds; else millis") {
    assert(Gts.normalizeEpochUs(0L, nowUs) == nowUs)
    assert(Gts.normalizeEpochUs(1L, nowUs) == 1000000L)
    assert(Gts.normalizeEpochUs(4294967294L, nowUs) == 4294967294L * 1000000L)
    assert(Gts.normalizeEpochUs(4294967295L, nowUs) == 4294967295L * 1000L) // boundary: millis
    assert(Gts.normalizeEpochUs(1346846400000L, nowUs) == 1346846400000000L)
  }

  test("negative epochs compare < 0xFFFFFFFF and are treated as seconds (Go signed compare)") {
    assert(Gts.normalizeEpochUs(-5L, nowUs) == -5000000L)
  }

  test("GtsRow round-trip for every value type") {
    val cases = Seq(
      Gts(Some(1L), "a", Map("k" -> "v"), GtsValue.long(7)),
      Gts(Some(1L), "b", Map.empty, GtsValue.double(1.5)),
      Gts(None, "c", Map.empty, GtsValue.bool(true)),
      Gts(None, "d", Map.empty, GtsValue.string("s")))
    cases.foreach { g => assert(Gts.toRow(g).toGts == g) }
    assert(Gts.toRow(cases(0)).vtype == "long")
    assert(Gts.toRow(cases(1)).v_double.contains(1.5))
    assert(Gts.toRow(cases(2)).ts_us.isEmpty)
  }
}
