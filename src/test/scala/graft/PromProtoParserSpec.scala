package graft

import graft.parsers.PromProtoParser
import graft.parsers.PromProtoParser.{Bucket, Metric, MetricFamily, Quantile}
import org.scalatest.funsuite.AnyFunSuite

/** Protobuf exposition decode + expfmt-style flattening (reference
  * catalyser/prometheus.go:40-49 — delimited MetricFamily negotiation).
  */
class PromProtoParserSpec extends AnyFunSuite {

  private def gd(g: graft.core.Gts): Double =
    g.value.asInstanceOf[graft.core.GtsValue.GtsDouble].v

  private def roundtrip(fams: Seq[MetricFamily]): Seq[MetricFamily] =
    PromProtoParser.parseDelimited(PromProtoParser.encodeDelimited(fams)).toOption.get

  test("counter family round-trips and flattens to one sample") {
    val fam = MetricFamily("http_requests_total", PromProtoParser.COUNTER,
      Seq(Metric(Map("code" -> "200"), Some(1027.0), None, None, Some(1712000000123L))))
    val got = roundtrip(Seq(fam))
    assert(got == Seq(fam))
    val gts = PromProtoParser.flatten(got, Map("job" -> "api"), 0L)
    assert(gts.size == 1)
    assert(gts.head.name == "http_requests_total")
    assert(gts.head.labels == Map("code" -> "200", "job" -> "api"))
    assert(gts.head.ts.contains(1712000000123000L)) // ms -> µs
  }

  test("summary flattens to quantile samples + _sum + _count") {
    val fam = MetricFamily("rpc_latency", PromProtoParser.SUMMARY,
      Seq(Metric(Map("svc" -> "a"), None,
        Some((144L, 12.5, Seq(Quantile(0.5, 0.03), Quantile(0.99, 0.2)))),
        None, Some(5L))))
    val gts = PromProtoParser.flatten(roundtrip(Seq(fam)), Map.empty, 0L)
    assert(gts.map(g => (g.name, g.labels.get("quantile"))) == Seq(
      ("rpc_latency", Some("0.5")), ("rpc_latency", Some("0.99")),
      ("rpc_latency_sum", None), ("rpc_latency_count", None)))
    assert(gts(2).value == graft.core.GtsValue.double(12.5))
    assert(gts(3).value == graft.core.GtsValue.double(144.0))
  }

  test("histogram flattens to le buckets + _sum + _count; +Inf synthesized when absent") {
    val explicit = MetricFamily("dur", PromProtoParser.HISTOGRAM,
      Seq(Metric(Map.empty, None, None,
        Some((7L, 3.5, Seq(Bucket(2, 0.1), Bucket(7, Double.PositiveInfinity)))), Some(1L))))
    val implicit_ = MetricFamily("dur", PromProtoParser.HISTOGRAM,
      Seq(Metric(Map.empty, None, None,
        Some((7L, 3.5, Seq(Bucket(2, 0.1)))), Some(1L))))
    val a = PromProtoParser.flatten(roundtrip(Seq(explicit)), Map.empty, 0L)
    val b = PromProtoParser.flatten(roundtrip(Seq(implicit_)), Map.empty, 0L)
    assert(a.map(g => (g.name, g.labels.get("le"), gd(g)))
      == b.map(g => (g.name, g.labels.get("le"), gd(g))))
    assert(a.map(_.labels.get("le")) == Seq(Some("0.1"), Some("+Inf"), None, None))
    assert(a(1).value == graft.core.GtsValue.double(7.0)) // +Inf bucket carries sample_count
  }

  test("±Inf sample values are dropped, family name overrides inner __name__") {
    val fam = MetricFamily("real_name", PromProtoParser.GAUGE, Seq(
      Metric(Map("__name__" -> "fake"), Some(Double.PositiveInfinity), None, None, Some(1L)),
      Metric(Map("__name__" -> "fake"), Some(2.0), None, None, Some(1L))))
    val gts = PromProtoParser.flatten(Seq(fam), Map.empty, 0L)
    assert(gts.size == 1)
    assert(gts.head.name == "real_name")
    assert(!gts.head.labels.contains("__name__"))
  }

  test("missing timestamp gets caller-injected now (prometheus.go:67-71)") {
    val fam = MetricFamily("m", PromProtoParser.UNTYPED,
      Seq(Metric(Map.empty, Some(1.0), None, None, None)))
    val gts = PromProtoParser.flatten(Seq(fam), Map.empty, 42L)
    assert(gts.head.ts.contains(42000L))
  }

  test("content negotiation: proto type -> proto path, absent/other -> text fallback") {
    val wire = PromProtoParser.encodeDelimited(Seq(
      MetricFamily("m", PromProtoParser.COUNTER,
        Seq(Metric(Map.empty, Some(1.0), None, None, Some(1L))))))
    val viaProto = PromProtoParser.parseExposition(
      wire, Some(PromProtoParser.ProtoContentType), Map.empty, 0L)
    assert(viaProto.toOption.get.map(_.name) == Seq("m"))
    val text = "m 1 1\n".getBytes("UTF-8")
    assert(PromProtoParser.parseExposition(text, None, Map.empty, 0L)
      .toOption.get.map(_.name) == Seq("m"))
    assert(PromProtoParser.parseExposition(text, Some("text/plain; version=0.0.4"),
      Map.empty, 0L).toOption.get.map(_.name) == Seq("m"))
  }

  test("unknown fields are skipped (schema evolution tolerance)") {
    // append an unknown field (field 9, varint) inside a Metric by hand:
    // encode a family then splice — simpler: decode must tolerate trailing
    // unknown family-level field. Build family bytes manually.
    val base = PromProtoParser.encodeDelimited(Seq(
      MetricFamily("m", PromProtoParser.COUNTER,
        Seq(Metric(Map.empty, Some(1.0), None, None, Some(1L))))))
    // recompute: prepend a second delimited message with only unknown fields
    val unknown = Array[Byte](2, (9 << 3).toByte, 1) // len=2: field 9 varint value 1
    val got = PromProtoParser.parseDelimited(unknown ++ base).toOption.get
    assert(got.size == 2 && got(1).name == "m")
  }

  test("truncated stream is an error, not a crash") {
    val wire = PromProtoParser.encodeDelimited(Seq(
      MetricFamily("m", PromProtoParser.COUNTER,
        Seq(Metric(Map.empty, Some(1.0), None, None, Some(1L))))))
    assert(PromProtoParser.parseDelimited(wire.dropRight(3)).isLeft)
  }

  test("goFloatLabel matches Go fmt.Sprint for label constants") {
    assert(PromProtoParser.goFloatLabel(0.5) == "0.5")
    assert(PromProtoParser.goFloatLabel(0.99) == "0.99")
    assert(PromProtoParser.goFloatLabel(Double.PositiveInfinity) == "+Inf")
    assert(PromProtoParser.goFloatLabel(Double.NegativeInfinity) == "-Inf")
    assert(PromProtoParser.goFloatLabel(10.0) == "10")
    assert(PromProtoParser.goFloatLabel(0.025) == "0.025")
  }

  test("goFloatLabel follows Go shortest-%g scientific-notation switch") {
    // goldens from Go: for v in {...} { fmt.Println(fmt.Sprint(v)) }
    // decimal while exponent in [-4, 6)
    assert(PromProtoParser.goFloatLabel(100000.0) == "100000")
    assert(PromProtoParser.goFloatLabel(999999.0) == "999999")
    assert(PromProtoParser.goFloatLabel(0.0001) == "0.0001")
    assert(PromProtoParser.goFloatLabel(0.0005) == "0.0005")
    assert(PromProtoParser.goFloatLabel(123456.789) == "123456.789")
    // scientific at exponent >= 6 (bytes/ns histogram bucket bounds)
    assert(PromProtoParser.goFloatLabel(1e6) == "1e+06")
    assert(PromProtoParser.goFloatLabel(1048576.0) == "1.048576e+06")
    assert(PromProtoParser.goFloatLabel(2.5e7) == "2.5e+07")
    assert(PromProtoParser.goFloatLabel(1e15) == "1e+15")
    assert(PromProtoParser.goFloatLabel(1e100) == "1e+100")
    // scientific at exponent < -4 (sub-0.1ms latency bounds)
    assert(PromProtoParser.goFloatLabel(5e-05) == "5e-05")
    assert(PromProtoParser.goFloatLabel(1e-05) == "1e-05")
    assert(PromProtoParser.goFloatLabel(2.5e-07) == "2.5e-07")
    // sign / zero / shortest-round-trip edges
    assert(PromProtoParser.goFloatLabel(-1048576.0) == "-1.048576e+06")
    assert(PromProtoParser.goFloatLabel(-0.0005) == "-0.0005")
    assert(PromProtoParser.goFloatLabel(0.0) == "0")
    assert(PromProtoParser.goFloatLabel(0.1) == "0.1")
    assert(PromProtoParser.goFloatLabel(0.30000000000000004) == "0.30000000000000004")
    assert(PromProtoParser.goFloatLabel(9.536743164e-07) == "9.536743164e-07")
  }

  test("wire round-trip: 500 random family batches encode -> parseDelimited -> identical") {
    // property pass over the full wire schema: every field kind
    // (labels, counter/gauge/untyped value, summary quantiles, histogram
    // buckets, optional timestamp), multi-family batches, empty metrics
    val rnd = new scala.util.Random(41)
    def randDouble(): Double = rnd.nextInt(5) match {
      case 0 => rnd.nextLong().toDouble / 1e6
      case 1 => rnd.nextInt(1000).toDouble
      case 2 => math.exp(rnd.nextGaussian() * 20) // huge/tiny magnitudes
      case 3 => -rnd.nextDouble()
      case _ => rnd.nextDouble() * 1e9
    }
    def randLabels(): Map[String, String] =
      (0 until rnd.nextInt(3)).map(i => s"l${('a' + i).toChar}" -> s"v${rnd.nextInt(100)}").toMap
    def randMetric(kind: Int): PromProtoParser.Metric = {
      val ts = if (rnd.nextBoolean()) Some(rnd.nextLong().abs % (1L << 50)) else None
      kind match {
        case PromProtoParser.SUMMARY =>
          val qs = (0 until rnd.nextInt(4)).map(_ => PromProtoParser.Quantile(rnd.nextDouble(), randDouble()))
          PromProtoParser.Metric(randLabels(), None,
            Some((rnd.nextLong().abs % 100000, randDouble(), qs)), None, ts)
        case PromProtoParser.HISTOGRAM =>
          val bs = (0 until rnd.nextInt(5)).map(_ => PromProtoParser.Bucket(rnd.nextLong().abs % 100000, randDouble()))
          PromProtoParser.Metric(randLabels(), None, None,
            Some((rnd.nextLong().abs % 100000, randDouble(), bs)), ts)
        case _ =>
          PromProtoParser.Metric(randLabels(), Some(randDouble()), None, None, ts)
      }
    }
    for (_ <- 1 to 500) {
      val fams = (0 until 1 + rnd.nextInt(3)).map { i =>
        val kind = Seq(PromProtoParser.COUNTER, PromProtoParser.GAUGE,
          PromProtoParser.UNTYPED, PromProtoParser.SUMMARY, PromProtoParser.HISTOGRAM)(rnd.nextInt(5))
        PromProtoParser.MetricFamily(s"fam_$i", kind,
          (0 until rnd.nextInt(3)).map(_ => randMetric(kind)))
      }
      val wire = PromProtoParser.encodeDelimited(fams)
      PromProtoParser.parseDelimited(wire) match {
        case Right(got) => assert(got == fams, s"round-trip mismatch:\n$got\nvs\n$fams")
        case Left(err)  => fail(s"parse failed on own encoding: $err")
      }
    }
  }

  test("goFloatLabel round-trips every emitted label back to the same double") {
    val vs = Seq(0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1.0, 2.5, 5.0, 10.0,
      1e6, 1048576.0, 5e-4, 1e-5, 0.30000000000000004, 1.7976931348623157e308,
      4.9e-324, 2.2250738585072014e-308)
    for (v <- vs) {
      val s = PromProtoParser.goFloatLabel(v)
      assert(java.lang.Double.parseDouble(s.replace("+Inf", "Infinity")) == v,
        s"$v printed as $s")
    }
  }
}
