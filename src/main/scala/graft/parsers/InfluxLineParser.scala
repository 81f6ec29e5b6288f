package graft.parsers

import graft.core.{Gts, GtsValue}

import scala.collection.mutable

/** InfluxDB line protocol parser (behavior of the vendored parser the
  * reference delegates to at catalyser/influxdb.go:59-84, re-implemented
  * from the PUBLIC line-protocol grammar — measurement,tags fields [ts]).
  *
  * Per point with N fields the reference emits N GTS with
  * `name = measurement + "." + field` (catalyser/influxdb.go:73-80, the
  * separator constant influxdb.go:19-20) and ts ns→µs
  * (catalyser/influxdb.go:75).
  *
  * Escaping rules (public InfluxDB 1.x reference):
  *  - measurement: `\,` and `\ ` escapes;
  *  - tag keys/values, field keys: `\,`, `\=`, `\ `;
  *  - field string values: double-quoted, `\"` and `\\` escapes;
  *  - field values: `N i` suffix → int64; `true/t/TRUE/True/T` etc bools;
  *    bare numbers → float64.
  */
object InfluxLineParser {

  final case class Point(
      measurement: String,
      tags: Map[String, String],
      fields: Seq[(String, GtsValue)],
      tsNs: Option[Long])

  /** Precision multiplier to nanoseconds (catalyser/influxdb.go:25-28 takes
    * the `precision` URL param, default "n").
    */
  def precisionToNs(precision: String): Long = precision match {
    case "n" | "ns" | "" => 1L
    case "u" | "us" | "µ" => 1000L
    case "ms"            => 1000000L
    case "s"             => 1000000000L
    case "m"             => 60L * 1000000000L
    case "h"             => 3600L * 1000000000L
    case _               => 1L
  }

  /** Parse a full payload: one point per non-empty line. Any line error
    * fails the whole payload (the vendored ParsePoints behavior the
    * reference relies on: influxdb.go:62-65 returns on error).
    */
  def parsePayload(in: String, precision: String, nowNs: Long): Either[String, Seq[Gts]] = {
    val out = mutable.ArrayBuffer.empty[Gts]
    for (rawLine <- in.split("\n", -1)) {
      val line = rawLine.stripSuffix("\r").trim
      if (line.nonEmpty && !line.startsWith("#")) {
        parseLine(line, precision, nowNs) match {
          case Left(err) => return Left(err)
          case Right(gts) => out ++= gts
        }
      }
    }
    Right(out.toSeq)
  }

  /** One line → N GTS (one per field). */
  def parseLine(line: String, precision: String, nowNs: Long): Either[String, Seq[Gts]] =
    parsePoint(line, precision, nowNs).map { p =>
      val tsUs = p.tsNs.map(_ / 1000L)
      p.fields.map { case (fname, fval) =>
        Gts(tsUs, p.measurement + "." + fname, p.tags, fval)
      }
    }

  def parsePoint(line: String, precision: String, nowNs: Long): Either[String, Point] = {
    val mult = precisionToNs(precision)
    var i = 0
    val n = line.length

    // --- measurement (escapes: \, and \space) ---
    val meas = new StringBuilder
    var done = false
    var sawComma = false
    while (i < n && !done) {
      val c = line.charAt(i)
      if (c == '\\' && i + 1 < n && (line.charAt(i + 1) == ',' || line.charAt(i + 1) == ' ')) {
        meas.append(line.charAt(i + 1)); i += 2
      } else if (c == ',') { sawComma = true; done = true; i += 1 }
      else if (c == ' ') { done = true; i += 1 }
      else { meas.append(c); i += 1 }
    }
    if (meas.isEmpty) return Left("missing measurement")
    if (!done) return Left("missing fields")

    // --- identifier token (tag key/value, field key): escapes \, \= \space ---
    def ident(stops: Set[Char]): String = {
      val sb = new StringBuilder
      var stop = false
      while (i < n && !stop) {
        val c = line.charAt(i)
        if (c == '\\' && i + 1 < n &&
            (line.charAt(i + 1) == ',' || line.charAt(i + 1) == '=' || line.charAt(i + 1) == ' ')) {
          sb.append(line.charAt(i + 1)); i += 2
        } else if (stops.contains(c)) stop = true
        else { sb.append(c); i += 1 }
      }
      sb.toString
    }

    // --- tags ---
    val tags = mutable.LinkedHashMap.empty[String, String]
    if (sawComma) {
      var more = true
      while (more) {
        val k = ident(Set('=', ',', ' '))
        if (i >= n || line.charAt(i) != '=') return Left(s"bad tag '$k'")
        i += 1
        val v = ident(Set('=', ',', ' '))
        if (k.isEmpty || v.isEmpty) return Left("empty tag key or value")
        tags(k) = v
        if (i < n && line.charAt(i) == ',') { i += 1 }
        else if (i < n && line.charAt(i) == ' ') { i += 1; more = false }
        else if (i >= n) return Left("missing fields")
        else return Left("bad tag separator")
      }
    }

    // --- fields ---
    val fields = mutable.ArrayBuffer.empty[(String, GtsValue)]
    var inFields = true
    while (inFields) {
      val k = ident(Set('=', ',', ' '))
      if (k.isEmpty || i >= n || line.charAt(i) != '=') return Left("bad field key")
      i += 1
      if (i >= n) return Left("missing field value")
      val v: GtsValue =
        if (line.charAt(i) == '"') {
          i += 1
          val sb = new StringBuilder
          var closed = false
          while (i < n && !closed) {
            val c = line.charAt(i)
            if (c == '\\' && i + 1 < n && (line.charAt(i + 1) == '"' || line.charAt(i + 1) == '\\')) {
              sb.append(line.charAt(i + 1)); i += 2
            } else if (c == '"') { closed = true; i += 1 }
            else { sb.append(c); i += 1 }
          }
          if (!closed) return Left("unterminated string field")
          GtsValue.string(sb.toString)
        } else {
          val start = i
          while (i < n && line.charAt(i) != ',' && line.charAt(i) != ' ') i += 1
          parseFieldValue(line.substring(start, i)) match {
            case Left(err) => return Left(err)
            case Right(fv) => fv
          }
        }
      fields += ((k, v))
      // after a field value only ',', ' ' or end-of-line are legal
      if (i < n && line.charAt(i) == ',') i += 1
      else if (i >= n || line.charAt(i) == ' ') inFields = false
      else return Left(s"bad character after field value at position $i")
    }
    if (fields.isEmpty) return Left("missing fields")

    // --- optional timestamp ---
    var tsNs = truncate(nowNs, mult)
    if (i < n && line.charAt(i) == ' ') {
      i += 1
      while (i < n && line.charAt(i) == ' ') i += 1
      if (i < n) {
        val tok = line.substring(i).trim
        if (tok.nonEmpty) {
          try tsNs = java.lang.Long.parseLong(tok) * mult
          catch { case _: NumberFormatException => return Left(s"bad timestamp '$tok'") }
        }
      }
    }
    Right(Point(meas.toString, tags.toMap, fields.toSeq, Some(tsNs)))
  }

  /** Missing ts → now truncated to the request precision (vendored
    * ParsePointsWithPrecision behavior).
    */
  private def truncate(nowNs: Long, mult: Long): Long = (nowNs / mult) * mult

  private val boolTrue = Set("t", "T", "true", "True", "TRUE")
  private val boolFalse = Set("f", "F", "false", "False", "FALSE")

  def parseFieldValue(tok: String): Either[String, GtsValue] = {
    if (tok.isEmpty) Left("empty field value")
    else if (boolTrue.contains(tok)) Right(GtsValue.bool(true))
    else if (boolFalse.contains(tok)) Right(GtsValue.bool(false))
    else if (tok.endsWith("i")) {
      try Right(GtsValue.long(java.lang.Long.parseLong(tok.dropRight(1))))
      catch { case _: NumberFormatException => Left(s"bad integer field '$tok'") }
    } else {
      val last = tok.charAt(tok.length - 1)
      val lower = tok.toLowerCase
      if (last == 'd' || last == 'D' || last == 'f' || last == 'F' ||
          tok.contains("0x") || tok.contains("0X") ||
          // Java parseDouble accepts NaN/Infinity; the influx grammar doesn't
          lower.contains("nan") || lower.contains("inf"))
        Left(s"bad field value '$tok'")
      else
        try Right(GtsValue.double(java.lang.Double.parseDouble(tok)))
        catch { case _: NumberFormatException => Left(s"bad field value '$tok'") }
    }
  }
}
