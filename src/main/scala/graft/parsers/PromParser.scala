package graft.parsers

import graft.core.{Gts, GtsValue}

import scala.collection.mutable

/** Prometheus exposition text parser + remote-write sample normalizer
  * (reference: catalyser/prometheus.go and
  * catalyser/prometheus_remote_write.go). The reference decodes exposition
  * via the public expfmt library; we parse the PUBLIC text exposition
  * grammar directly: `name{k="v",...} value [timestamp_ms]`, '#' comment and
  * blank lines skipped.
  *
  * Faithful behaviors:
  *  - ±Inf samples are DROPPED, NaN is KEPT (prometheus.go:83-85 checks only
  *    math.Inf);
  *  - label `__name__` overrides the metric name (prometheus.go:88-94);
  *  - extra labels from the URL path override inner labels
  *    (prometheus.go:96-99); odd path pair count = error (prometheus.go:26-38);
  *  - missing timestamp → now injected (prometheus.go:67-71); ts is
  *    MILLISECONDS → µs (prometheus.go:101);
  *  - values are always float64.
  */
object PromParser {

  /** `/job/j/instance/i` → pairs; odd count → error (prometheus.go:26-38). */
  def pathLabels(path: String): Either[String, Map[String, String]] = {
    val parts = path.split("/").filter(_.nonEmpty)
    if (parts.length % 2 != 0) Left("invalid number of label path arguments")
    else Right(parts.grouped(2).map(p => p(0) -> p(1)).toMap)
  }

  private val metricLine = """^([a-zA-Z_:][a-zA-Z0-9_:]*)(?:\{(.*)\})?\s+(\S+)(?:\s+(-?\d+))?\s*$""".r

  /** Parse `k="v",k2="v2"` with \\, \", \n escapes inside quoted values. */
  def parseLabelSet(s: String): Either[String, Map[String, String]] = {
    val out = mutable.LinkedHashMap.empty[String, String]
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && (s.charAt(i) == ',' || s.charAt(i) == ' ')) i += 1
      if (i < n) {
        val eq = s.indexOf('=', i)
        if (eq < 0) return Left(s"bad label set '$s'")
        val key = s.substring(i, eq).trim
        i = eq + 1
        if (i >= n || s.charAt(i) != '"') return Left(s"bad label value in '$s'")
        i += 1
        val sb = new StringBuilder
        var closed = false
        while (i < n && !closed) {
          val c = s.charAt(i)
          if (c == '\\' && i + 1 < n) {
            s.charAt(i + 1) match {
              case '\\' => sb.append('\\'); i += 2
              case '"'  => sb.append('"'); i += 2
              case 'n'  => sb.append('\n'); i += 2
              case other => sb.append('\\').append(other); i += 2
            }
          } else if (c == '"') { closed = true; i += 1 }
          else { sb.append(c); i += 1 }
        }
        if (!closed) return Left(s"unterminated label value in '$s'")
        out(key) = sb.toString
      }
    }
    Right(out.toMap)
  }

  def parseValue(tok: String): Either[String, Double] = tok match {
    case "+Inf" | "Inf" | "+inf" | "inf" => Right(Double.PositiveInfinity)
    case "-Inf" | "-inf"                 => Right(Double.NegativeInfinity)
    case "NaN" | "nan" | "NAN"           => Right(Double.NaN)
    case t =>
      try Right(java.lang.Double.parseDouble(t))
      catch { case _: NumberFormatException => Left(s"bad sample value '$t'") }
  }

  /** Exposition text body → GTS seq; extraLabels merged over inner labels;
    * ±Inf dropped; `__name__` wins over the line's metric name.
    */
  def parseExposition(
      body: String,
      extraLabels: Map[String, String],
      nowMs: Long): Either[String, Seq[Gts]] = {
    val out = Seq.newBuilder[Gts]
    for (rawLine <- body.split("\n", -1)) {
      val line = rawLine.trim
      if (line.nonEmpty && !line.startsWith("#")) {
        line match {
          case metricLine(name, labelStr, valueTok, tsTok) =>
            val labels = Option(labelStr) match {
              case Some(ls) if ls.trim.nonEmpty =>
                parseLabelSet(ls) match {
                  case Left(err) => return Left(err)
                  case Right(m)  => m
                }
              case _ => Map.empty[String, String]
            }
            parseValue(valueTok) match {
              case Left(err) => return Left(err)
              case Right(v) if v.isInfinite => // dropped (prometheus.go:83-85)
              case Right(v) =>
                val tsMs = Option(tsTok) match {
                  case None => nowMs
                  case Some(t) =>
                    try t.toLong
                    catch { case _: NumberFormatException =>
                      return Left(s"timestamp out of range '$t'") }
                }
                val merged = labels - "__name__" ++ extraLabels
                val finalName = labels.getOrElse("__name__", name)
                out += Gts(Some(tsMs * 1000L), finalName, merged, GtsValue.double(v))
            }
          case _ => return Left(s"Invalid format: '$line'")
        }
      }
    }
    Right(out.result())
  }

  /** remote_write sample normalization (prometheus_remote_write.go:52-86):
    * non-finite (±Inf AND NaN) values → 0 — coerced, not dropped, unlike
    * exposition (prometheus_remote_write.go:70-73); ts ms → µs (:78).
    */
  def normalizeRemoteWriteSample(
      labels: Map[String, String],
      value: Double,
      tsMs: Long): Gts = {
    val v = if (value.isNaN || value.isInfinite) 0.0 else value
    val name = labels.getOrElse("__name__", "")
    Gts(Some(tsMs * 1000L), name, labels - "__name__", GtsValue.double(v))
  }
}
