package graft.parsers

import java.nio.charset.StandardCharsets

/** Carbon's pickle bulk protocol — the OTHER graphite wire format (the
  * plaintext line protocol is A6): clients ship a python-pickled
  * `[(metric, (timestamp, value)), ...]` list, the batch form every
  * carbon-relay/aggregator speaks (graphite-project/carbon
  * lib/carbon/protocols.py MetricPickleReceiver — public; the reference
  * repo stops at the line protocol, catalyser/graphite.go:271, so this
  * closes the graphite family). Python pickle is a stack machine; the
  * subset a carbon client actually emits for integer-valued points is
  * small and fixed, so the decoder is a ~dozen-opcode interpreter, the
  * same hand-rolled-wire-decoder discipline as [[PrompbParser]].
  *
  * Encoder emits canonical protocol-2 frames (PROTO, EMPTY_LIST,
  * BINPUT, MARK, per-point BINUNICODE metric + BININT/LONG1 numbers +
  * two TUPLE2s, APPENDS, STOP). Decoder additionally accepts BININT1/
  * BININT2 and arbitrary-width LONG1 — the encodings CPython picks for
  * small/large ints — and rejects anything else loudly (Left), because
  * a metrics daemon must NEVER eval-style-trust a pickle: opcode
  * allowlisting is the standard carbon hardening.
  */
object CarbonPickleParser {

  /** One metric point: (metric path, epoch seconds, integer value). */
  type Point = (String, Long, Long)

  /** Canonical protocol-2 pickle of `[(metric, (ts, v)), ...]`. */
  def encode(points: Seq[Point]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le32(x: Int): Unit = {
      out.write(x & 0xff); out.write((x >> 8) & 0xff)
      out.write((x >> 16) & 0xff); out.write((x >> 24) & 0xff)
    }
    def num(v: Long): Unit =
      if (v >= Int.MinValue && v <= Int.MaxValue) { out.write('J'); le32(v.toInt) }
      else { // LONG1: n bytes, little-endian two's complement
        var bytes = List.empty[Int]
        var x = v
        var done = false
        while (!done) {
          bytes = bytes :+ (x & 0xff).toInt
          val sign = (x & 0x80) != 0
          x >>= 8
          done = (x == 0 && !sign) || (x == -1 && sign)
        }
        out.write(0x8a); out.write(bytes.length)
        bytes.foreach(out.write)
      }
    out.write(0x80); out.write(2) // PROTO 2
    out.write(']') // EMPTY_LIST
    out.write('q'); out.write(0) // BINPUT 0
    out.write('(') // MARK
    points.foreach { case (metric, ts, v) =>
      val mb = metric.getBytes(StandardCharsets.UTF_8)
      out.write('X'); le32(mb.length); out.write(mb) // BINUNICODE
      num(ts); num(v)
      out.write(0x86) // TUPLE2 -> (ts, v)
      out.write(0x86) // TUPLE2 -> (metric, (ts, v))
    }
    out.write('e') // APPENDS
    out.write('.') // STOP
    out.toByteArray
  }

  /** Decode an allowlisted-opcode pickle back to points. Any opcode
    * outside the carbon subset, malformed framing, or a non-(str,
    * (int, int)) shape returns Left(reason).
    */
  def decode(bytes: Array[Byte]): Either[String, Seq[Point]] = {
    var i = 0
    def u8(): Int = { val b = bytes(i) & 0xff; i += 1; b }
    def le32(): Int = u8() | (u8() << 8) | (u8() << 16) | (u8() << 24)
    sealed trait V
    case class S(s: String) extends V
    case class N(v: Long) extends V
    case class T(a: V, b: V) extends V
    case object Mark extends V
    val stack = scala.collection.mutable.ArrayBuffer.empty[V]
    val list = scala.collection.mutable.ArrayBuffer.empty[V]
    try {
      if (bytes.length < 2 || (bytes(0) & 0xff) != 0x80) return Left("no PROTO header")
      i = 1
      val proto = u8()
      if (proto < 2 || proto > 4) return Left(s"unsupported pickle protocol $proto")
      var listOpen = false
      while (i < bytes.length) {
        (u8(): @annotation.switch) match {
          case 0x5d => listOpen = true // ']' EMPTY_LIST
          case 0x71 => u8() // 'q' BINPUT n — memo write, ignored
          case 0x72 => le32() // 'r' LONG_BINPUT
          case 0x28 => stack += Mark // '(' MARK
          case 0x58 => // 'X' BINUNICODE
            val n = le32()
            if (n < 0 || i + n > bytes.length) return Left("truncated BINUNICODE")
            stack += S(new String(bytes, i, n, StandardCharsets.UTF_8)); i += n
          case 0x4a => stack += N(le32().toLong) // 'J' BININT (signed le32)
          case 0x4b => stack += N(u8().toLong) // 'K' BININT1
          case 0x4d => stack += N((u8() | (u8() << 8)).toLong) // 'M' BININT2
          case 0x8a => // LONG1
            val n = u8()
            if (n > 8) return Left(s"LONG1 width $n exceeds 64-bit")
            var v = 0L
            for (k <- 0 until n) v |= (u8().toLong << (8 * k))
            if (n > 0 && n < 8 && (v & (1L << (8 * n - 1))) != 0) v -= 1L << (8 * n)
            stack += N(v)
          case 0x86 => // TUPLE2
            if (stack.length < 2) return Left("TUPLE2 underflow")
            val b = stack.remove(stack.length - 1)
            val a = stack.remove(stack.length - 1)
            stack += T(a, b)
          case 0x65 => // 'e' APPENDS: pop to MARK into the list
            val m = stack.lastIndexOf(Mark)
            if (m < 0 || !listOpen) return Left("APPENDS without MARK/list")
            list ++= stack.slice(m + 1, stack.length)
            stack.remove(m, stack.length - m)
          case 0x61 => // 'a' APPEND single
            if (stack.isEmpty || !listOpen) return Left("APPEND without list")
            list += stack.remove(stack.length - 1)
          case 0x2e => // '.' STOP
            if (stack.nonEmpty) return Left("STOP with non-empty stack")
            val pts = list.map {
              case T(S(m), T(N(ts), N(v))) => (m, ts, v)
              case other => return Left(s"non-carbon shape: $other")
            }.toSeq
            return Right(pts)
          case op => return Left(f"disallowed opcode 0x$op%02x")
        }
      }
      Left("no STOP opcode")
    } catch {
      case _: ArrayIndexOutOfBoundsException => Left("truncated pickle")
    }
  }
}
