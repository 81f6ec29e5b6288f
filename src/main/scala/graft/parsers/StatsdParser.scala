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
}
