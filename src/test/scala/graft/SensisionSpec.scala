package graft

import graft.core.{Gts, GtsValue, Sensision}
import org.scalatest.funsuite.AnyFunSuite

/** Golden Sensision encodings (FIXTURES.md §A.6, reference
  * core/warp.go:423-478) + seeded randomized properties.
  */
class SensisionSpec extends AnyFunSuite {

  test("golden: int64 value with sorted labels") {
    val g = Gts(Some(1346846400000000L), "sys.cpu.nice",
      Map("host" -> "web01", "dc" -> "lga"), GtsValue.long(18))
    assert(Sensision.encode(g) == "1346846400000000// sys.cpu.nice{dc=lga,host=web01} 18\r\n")
  }

  test("golden: float value Go %f fixed 6 decimals") {
    val g = Gts(Some(1546420308000000L), "tcp_metric", Map.empty, GtsValue.double(14.2))
    assert(Sensision.encode(g) == "1546420308000000// tcp_metric{} 14.200000\r\n")
  }

  test("golden: bool T + space in name -> %20 (never '+')") {
    val g = Gts(Some(1346846400000000L), "my flag", Map.empty, GtsValue.bool(true))
    assert(Sensision.encode(g) == "1346846400000000// my%20flag{} T\r\n")
  }

  test("golden: missing ts omitted, string value quoted + URL-encoded") {
    val g = Gts(None, "note", Map.empty, GtsValue.string("a,b"))
    assert(Sensision.encode(g) == "// note{} 'a%2Cb'\r\n")
  }

  test("string values keep '+' for spaces (plain QueryEscape, no %20 rewrite)") {
    // core/warp.go:467-468 calls QueryEscape WITHOUT the '+'->'%20' rewrite
    val g = Gts(None, "n", Map.empty, GtsValue.string("a b"))
    assert(Sensision.encode(g) == "// n{} 'a+b'\r\n")
  }

  test("bool false -> F; negative/zero floats") {
    assert(Sensision.encodeValue(GtsValue.bool(false)) == "F")
    assert(Sensision.encodeValue(GtsValue.double(-1.5)) == "-1.500000")
    assert(Sensision.encodeValue(GtsValue.double(0.0)) == "0.000000")
  }

  test("label keys and values URL-encoded with %20 for spaces") {
    val g = Gts(None, "n", Map("a key" -> "v/1"), GtsValue.long(1))
    assert(Sensision.encode(g) == "// n{a%20key=v%2F1} 1\r\n")
  }

  test("queryEscape matches Go keep-set [A-Za-z0-9-_.~]") {
    assert(Sensision.queryEscape("AZaz09-_.~") == "AZaz09-_.~")
    assert(Sensision.queryEscape("*") == "%2A") // Java URLEncoder would keep '*'
    assert(Sensision.queryEscape("~") == "~")   // Java URLEncoder would escape '~'
    assert(Sensision.queryEscape("é") == "%C3%A9") // UTF-8 bytes, upper hex
  }

  test("property: label order never matters (canonical sort)") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val m = (1 to 5).map(_ => (rnd.alphanumeric.take(4).mkString, rnd.alphanumeric.take(4).mkString)).toMap
      val g1 = Gts(Some(1L), "n", m, GtsValue.long(1))
      val g2 = Gts(Some(1L), "n", rnd.shuffle(m.toList).toMap, GtsValue.long(1))
      assert(Sensision.encode(g1) == Sensision.encode(g2))
    }
  }

  test("property: encoded line always terminates with CRLF and starts with ts + geo slot") {
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val name = rnd.alphanumeric.take(1 + rnd.nextInt(10)).mkString
      val v = rnd.nextLong()
      val enc = Sensision.encode(Gts(Some(123L), name, Map.empty, GtsValue.long(v)))
      assert(enc.endsWith("\r\n") && enc.startsWith("123// "))
    }
  }
}
