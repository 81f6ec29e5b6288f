package graft.parsers

/** The statsd line protocol (Etsy statsd, public README grammar):
  * `metric:value|type[|@rate]` with types `c` (counter), `g` (gauge),
  * `ms` (timer) and `s` (set). Two semantics quirks the flush
  * aggregation depends on and naive parsers drop:
  *  - a gauge value with an explicit `+`/`-` SIGN is a DELTA against
  *    the running gauge, an unsigned value is an absolute SET;
  *  - a counter's `@rate` means the client sampled, so the flush must
  *    scale by 1/rate to estimate the true count.
  * This parser keeps values in integer cents (`v`), flags gauge deltas
  * (`delta`), and returns the sample rate as the integer k of a 1/k
  * rate (statsd clients emit 1/k rates in practice; a non-unit-fraction
  * rate or any malformed field is a loud Left, never a guess — the
  * same strictness discipline as [[GraphiteParser]]).
  */
object StatsdParser {

  /** (metric, cents value, type, gauge-delta?, rate denominator k). */
  final case class Sample(metric: String, v: Long, mtype: String,
      delta: Boolean, rateK: Long)

  def parseLine(line: String): Either[String, Sample] = {
    val ci = line.indexOf(':')
    if (ci <= 0) return Left(s"no metric: $line")
    val metric = line.substring(0, ci)
    val parts = line.substring(ci + 1).split("\\|", -1)
    if (parts.length < 2 || parts.length > 3) return Left(s"bad field count: $line")
    val raw = parts(0)
    if (raw.isEmpty) return Left(s"empty value: $line")
    val delta = raw.charAt(0) == '+' || raw.charAt(0) == '-'
    val v =
      try java.lang.Long.parseLong(if (raw.charAt(0) == '+') raw.substring(1) else raw)
      catch { case _: NumberFormatException => return Left(s"bad value: $line") }
    val mtype = parts(1)
    if (mtype != "c" && mtype != "g" && mtype != "ms" && mtype != "s")
      return Left(s"unknown type '$mtype': $line")
    if (delta && mtype != "g") return Left(s"signed value outside gauge: $line")
    val rateK =
      if (parts.length == 2) 1L
      else {
        val r = parts(2)
        if (!r.startsWith("@")) return Left(s"bad rate field: $line")
        if (mtype != "c" && mtype != "ms") return Left(s"rate on non-sampled type: $line")
        // unit fractions only: @1, @0.5, @0.25, @0.125, @0.2, @0.1, …
        val body = r.substring(1)
        val k = body match {
          case "1" | "1.0" => 1L
          case s if s.startsWith("0.") =>
            val frac = s.substring(2)
            val num = try java.lang.Long.parseLong(frac)
              catch { case _: NumberFormatException => return Left(s"bad rate: $line") }
            if (num == 0) return Left(s"zero rate: $line")
            val scale = math.pow(10, frac.length).toLong
            if (scale % num != 0) return Left(s"non-unit-fraction rate: $line")
            scale / num
          case _ => return Left(s"bad rate: $line")
        }
        k
      }
    Right(Sample(metric, v, mtype, delta, rateK))
  }

  /** DogStatsD extension sample: the Datadog dialect of statsd (public
    * datagram spec) adds `|#tag1:val1,tag2` tag sections, value packing
    * (`metric:v1:v2:v3|h`), and the `h` (histogram) / `d` (distribution)
    * types. `tags` is the CANONICAL form — tag strings sorted — so two
    * lines with permuted tags aggregate to the same series key.
    */
  final case class DogSample(metric: String, values: Seq[Long], mtype: String,
      delta: Boolean, rateK: Long, tags: String)

  /** Parse one DogStatsD line. Same strictness discipline as
    * [[parseLine]]: any malformed field is a loud Left. Grammar:
    * `metric:v[:v…]|type[|@rate][|#tags]` with `@`/`#` sections in
    * either order, each at most once; rate on sampled types only
    * (c/ms/h/d); signed deltas only on gauges; packing only on
    * c/ms/h/d (a gauge set and a set member are single-valued).
    */
  def parseDogLine(line: String): Either[String, DogSample] = {
    val ci = line.indexOf(':')
    if (ci <= 0) return Left(s"no metric: $line")
    val metric = line.substring(0, ci)
    val parts = line.substring(ci + 1).split("\\|", -1)
    if (parts.length < 2 || parts.length > 4) return Left(s"bad field count: $line")
    val raws = parts(0).split(":", -1)
    if (raws.isEmpty || raws.exists(_.isEmpty)) return Left(s"empty value: $line")
    val delta = raws.length == 1 &&
      (raws(0).charAt(0) == '+' || raws(0).charAt(0) == '-')
    val values = raws.toSeq.map { raw =>
      try java.lang.Long.parseLong(if (raw.charAt(0) == '+') raw.substring(1) else raw)
      catch { case _: NumberFormatException => return Left(s"bad value: $line") }
    }
    val mtype = parts(1)
    if (mtype != "c" && mtype != "g" && mtype != "ms" && mtype != "s" &&
      mtype != "h" && mtype != "d") return Left(s"unknown type '$mtype': $line")
    if (values.length > 1 && (mtype == "g" || mtype == "s"))
      return Left(s"value packing outside c/ms/h/d: $line")
    if (raws.exists(r => r.charAt(0) == '+' || r.charAt(0) == '-') && mtype != "g")
      return Left(s"signed value outside gauge: $line")
    var rateK = 1L
    var sawRate = false
    var tags = ""
    var sawTags = false
    parts.drop(2).foreach { f =>
      if (f.startsWith("@")) {
        if (sawRate) return Left(s"duplicate rate: $line")
        sawRate = true
        if (mtype != "c" && mtype != "ms" && mtype != "h" && mtype != "d")
          return Left(s"rate on non-sampled type: $line")
        val body = f.substring(1)
        rateK = body match {
          case "1" | "1.0" => 1L
          case s if s.startsWith("0.") =>
            val frac = s.substring(2)
            val num = try java.lang.Long.parseLong(frac)
              catch { case _: NumberFormatException => return Left(s"bad rate: $line") }
            if (num == 0) return Left(s"zero rate: $line")
            val scale = math.pow(10, frac.length).toLong
            if (scale % num != 0) return Left(s"non-unit-fraction rate: $line")
            scale / num
          case _ => return Left(s"bad rate: $line")
        }
      } else if (f.startsWith("#")) {
        if (sawTags) return Left(s"duplicate tag section: $line")
        sawTags = true
        val ts = f.substring(1).split(",", -1)
        if (ts.exists(_.isEmpty)) return Left(s"empty tag: $line")
        tags = ts.sorted.mkString(",")
      } else return Left(s"unknown field '$f': $line")
    }
    Right(DogSample(metric, values, mtype, delta, rateK, tags))
  }
}
