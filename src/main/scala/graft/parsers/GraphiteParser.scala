package graft.parsers

import graft.core.{Gts, GtsValue}

/** Graphite plaintext protocol parser (reference: catalyser/graphite.go:314-407).
  *
  * Line format: `name[;tag=val...] value [timestamp]`. Faithful behaviors:
  *  - split on single spaces exactly (Go `strings.Split`, graphite.go:315) —
  *    consecutive spaces produce empty tokens and therefore parse errors;
  *  - fewer than 2 tokens → error (graphite.go:318-320);
  *  - timestamp token (3rd) parsed as int64, bad int → error
  *    (graphite.go:324-330); missing → now in MILLISECONDS then the
  *    seconds-vs-millis heuristic still runs (graphite.go:322, :370);
  *  - value inference order float → int → bool → string
  *    (graphite.go:334-366): float only if the token contains '.', bool
  *    only for case-insensitive "true"/"false";
  *  - hierarchy labels {"0": part0, ...} when `parse` is set, both with and
  *    without a tag suffix (graphite.go:381-403);
  *  - `;k=v` tags merged OVER hierarchy labels (graphite.go:388-392).
  */
object GraphiteParser {

  /** TCP first-line token prefix `TOKEN@.` (graphite.go:240-267). */
  def extractTcpToken(firstLine: String): Option[(String, Int)] = {
    val idx = firstLine.indexOf("@.")
    if (idx <= 0) None else Some((firstLine.substring(0, idx), idx + 2))
  }

  /** Go-compatible float parse: requires a '.', rejects Java-isms Go's
    * strconv.ParseFloat (go1.12) does not accept (d/f suffixes, hex floats,
    * surrounding whitespace).
    */
  private def parseGoFloat(s: String): Option[Double] = {
    if (s.isEmpty || !s.contains('.')) return None
    val last = s.charAt(s.length - 1)
    if (last == 'd' || last == 'D' || last == 'f' || last == 'F') return None
    if (s.exists(c => c.isWhitespace) || s.contains("0x") || s.contains("0X")) return None
    try {
      val v = java.lang.Double.parseDouble(s)
      // Go strconv.ParseFloat RANGE errors where Java stays silent: a
      // finite decimal overflowing to ±Inf, or a nonzero mantissa
      // underflowing to zero, both return err=ErrRange in Go — the
      // inference cascade then falls through to string
      // (graphite.go:336-340). Pin the same fall-through here.
      if (v.isInfinite) None
      else if (v == 0.0d && hasNonzeroMantissa(s)) None
      else Some(v)
    } catch { case _: NumberFormatException => None }
  }

  /** A nonzero digit before the exponent marker — zero parsed from such
    * a literal means hard underflow (below the smallest denormal).
    */
  private def hasNonzeroMantissa(s: String): Boolean = {
    val cut = s.indexWhere(c => c == 'e' || c == 'E')
    val m = if (cut < 0) s else s.substring(0, cut)
    m.exists(c => c >= '1' && c <= '9')
  }

  private def parseGoLong(s: String): Option[Long] =
    try Some(java.lang.Long.parseLong(s)) catch { case _: NumberFormatException => None }

  /** Value type inference cascade (graphite.go:332-367). */
  def inferValue(token: String): GtsValue =
    parseGoFloat(token).map(GtsValue.double)
      .orElse(parseGoLong(token).map(GtsValue.long))
      .orElse {
        val lower = token.toLowerCase
        if (lower == "true") Some(GtsValue.bool(true))
        else if (lower == "false") Some(GtsValue.bool(false))
        else None
      }
      .getOrElse(GtsValue.string(token))

  def parseLine(metric: String, parse: Boolean): Either[String, Gts] =
    parseLine(metric, parse, System.currentTimeMillis())

  def parseLine(metric: String, parse: Boolean, nowMs: Long): Either[String, Gts] = {
    val split = metric.split(" ", -1)
    if (split.length < 2) return Left("Bad metric format")

    var ts = nowMs
    if (split.length >= 3) {
      parseGoLong(split(2)) match {
        case Some(t) => ts = t
        case None    => return Left("Bad metric part: timestamp")
      }
    }

    val value = inferValue(split(1))
    val tsUs = Gts.normalizeEpochUs(ts, nowMs * 1000L)

    val head = split(0)
    var labels = Map.empty[String, String]
    val name =
      if (head.contains(";")) {
        val subSplit = head.split(";", -1)
        if (parse) labels = hierarchyLabels(subSplit(0))
        var i = 1
        while (i < subSplit.length) {
          val tagSplit = subSplit(i).split("=", -1)
          // the reference indexes [1] unchecked and would panic; we surface
          // a parse error instead (SURVEY.md §2 gaps note)
          if (tagSplit.length < 2) return Left("Bad metric part: tag")
          labels = labels + (tagSplit(0) -> tagSplit(1))
          i += 1
        }
        subSplit(0)
      } else {
        if (parse) labels = hierarchyLabels(head)
        head
      }

    Right(Gts(Some(tsUs), name, labels, value))
  }

  /** `a.b.c` → {"0":"a","1":"b","2":"c"} (graphite.go:381-403). */
  def hierarchyLabels(name: String): Map[String, String] =
    name.split("\\.", -1).zipWithIndex.map { case (p, i) => i.toString -> p }.toMap
}
