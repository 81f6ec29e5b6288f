package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.parsers.CarbonPickleParser

class CarbonPickleSpec extends AnyFunSuite {

  test("encode/decode round-trips points incl. negatives, LONG1 widths, unicode") {
    val pts = Seq(
      ("carbon.a.e1", 1700000000L, 42L),
      ("carbon.b.é²", -5L, -123456L), // unicode metric, negative numbers
      ("x", 0L, 0L),
      ("wide", 1L << 40, -(1L << 40)), // LONG1 beyond int32
      ("edge", Int.MaxValue.toLong, Int.MinValue.toLong),
      ("max", Long.MaxValue, Long.MinValue)) // 8-byte LONG1 both signs
    assert(CarbonPickleParser.decode(CarbonPickleParser.encode(pts)) == Right(pts))
    assert(CarbonPickleParser.decode(CarbonPickleParser.encode(Nil)) == Right(Nil))
  }

  test("deterministic randomized round-trip (1000 batches)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 1000) {
      val pts = Seq.fill(rnd.nextInt(8)) {
        (s"m.${rnd.nextInt(1000)}", rnd.nextLong() >> rnd.nextInt(40),
          rnd.nextLong() >> rnd.nextInt(40))
      }
      assert(CarbonPickleParser.decode(CarbonPickleParser.encode(pts)) == Right(pts))
    }
  }

  test("frame size matches the closed-form length the oracle predicts") {
    // int32-range numbers only (the query's domain): 8 + sum(17 + len)
    val pts = Seq(("carbon.click.e7", 1700000000L, 4902L),
      ("carbon.view.e123", 1700003600L, 1L))
    val expected = 8 + pts.map(17 + _._1.getBytes("UTF-8").length).sum
    assert(CarbonPickleParser.encode(pts).length == expected)
  }

  test("the decoder is an allowlist: GLOBAL and friends are rejected, never executed") {
    // 0x63 'c' GLOBAL is the pickle-RCE opcode carbon hardening exists for
    val evil = Array[Byte](0x80.toByte, 2, 'c', 'o', 's', '\n', 's', 'y',
      's', 't', 'e', 'm', '\n', '.')
    val r = CarbonPickleParser.decode(evil)
    assert(r.fold(_.contains("0x63"), _ => false), s"got $r")
  }

  test("malformed frames fail loudly") {
    val good = CarbonPickleParser.encode(Seq(("m", 1L, 2L)))
    assert(CarbonPickleParser.decode(good.dropRight(3)).isLeft) // truncated
    assert(CarbonPickleParser.decode(Array[Byte](0x80.toByte, 1, '.')).isLeft) // proto 1
    assert(CarbonPickleParser.decode(Array[Byte]('.', '.')).isLeft) // no header
    // wrong shape: a bare int list element
    val shape = Array[Byte](0x80.toByte, 2, ']', '(', 'K', 5, 'e', '.')
    assert(CarbonPickleParser.decode(shape).isLeft)
  }
}
