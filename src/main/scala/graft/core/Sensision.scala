package graft.core

/** Sensision text encoding of a GTS point (reference: core/warp.go:423-478):
  * `TS// name{k=v,...} value\r\n`.
  *
  * Divergence from the reference, by design (SURVEY.md §7.4): label order in
  * the reference is nondeterministic Go map iteration (core/warp.go:438-443);
  * we canonicalize by sorting label keys so output is deterministic.
  */
object Sensision {

  /** Go's `url.QueryEscape` keep-set: [A-Za-z0-9-_.~], space → '+', upper
    * hex for everything else. The reference then rewrites '+' → "%20" for
    * names and labels (Warp 10 ≥ 2.3.0 quirk, core/warp.go:434-441).
    */
  def queryEscape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8).foreach { b =>
      val c = (b & 0xFF).toChar
      if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
          (c >= '0' && c <= '9') || c == '-' || c == '_' || c == '.' || c == '~')
        sb.append(c)
      else if (c == ' ') sb.append('+')
      else sb.append(f"%%${b & 0xFF}%02X")
    }
    sb.toString
  }

  /** queryEscape with '+' → "%20" (core/warp.go:434-441). Applied to the
    * class name and label keys/values but NOT to string values
    * (core/warp.go:467-468 calls plain QueryEscape).
    */
  def urlEncodeWarp(s: String): String = queryEscape(s).replace("+", "%20")

  /** Go `fmt.Sprintf("%f", v)` — fixed 6 decimals (core/warp.go:456). */
  def goFloat(v: Double): String =
    String.format(java.util.Locale.ROOT, "%f", java.lang.Double.valueOf(v))

  def encodeValue(value: GtsValue): String = value match {
    case GtsValue.GtsBool(v)   => if (v) "T" else "F"          // core/warp.go:448-453
    case GtsValue.GtsDouble(v) => goFloat(v)                   // core/warp.go:456
    case GtsValue.GtsLong(v)   => v.toString                   // core/warp.go:458-459
    case GtsValue.GtsString(v) => "'" + queryEscape(v) + "'"   // core/warp.go:467-468
  }

  /** Full Sensision line incl. `\r\n` terminator. Missing ts → omitted
    * leading timestamp (core/warp.go:429-431); geo slot always empty
    * (`TS//`, core/warp.go:435).
    */
  def encode(g: Gts): String = {
    val sb = new StringBuilder(64)
    g.ts.foreach(t => sb.append(t))
    sb.append("// ").append(urlEncodeWarp(g.name)).append('{')
    var sep = ""
    g.labels.toSeq.sortBy(_._1).foreach { case (k, v) =>
      sb.append(sep).append(urlEncodeWarp(k)).append('=').append(urlEncodeWarp(v))
      sep = ","
    }
    sb.append("} ").append(encodeValue(g.value)).append("\r\n")
    sb.toString
  }
}
