package graft.core

/** Warp 10 backend error taxonomy (reference: core/warp.go:47-114 types,
  * core/warp.go:280-421 classifier, core/handler.go:210-459 HTTP mapping).
  * The classifier is ordered substring/regex matching over the response
  * body; first match wins — order below mirrors HandleError exactly.
  */
sealed trait WarpError extends Product with Serializable {
  def httpStatus: Int
  def bansToken: Boolean = false
  def label: String
}
object WarpError {
  final case class InvalidToken(token: String) extends WarpError {
    val httpStatus = 401; override val bansToken = true; val label = "invalid_token"
  }
  final case class ExpiredToken(token: String) extends WarpError {
    val httpStatus = 401; override val bansToken = true; val label = "expired_token"
  }
  final case class RevokedToken(token: String) extends WarpError {
    val httpStatus = 401; override val bansToken = true; val label = "revoked_token"
  }
  final case class MadsExceeded(app: String, limit: String) extends WarpError {
    val httpStatus = 429; val label = "mads_exceeded"
  }
  final case class DdpExceeded(app: String, limit: String) extends WarpError {
    val httpStatus = 429; val label = "ddp_exceeded"
  }
  final case class InputError(str: String) extends WarpError {
    val httpStatus = 422; val label = "input_error"
  }
  final case class GoneError(str: String) extends WarpError {
    val httpStatus = 410; val label = "gone"
  }
  case object BrokenPipe extends WarpError {
    val httpStatus = 503; val label = "broken_pipe"
  }
  final case class Unclassified(body: String) extends WarpError {
    val httpStatus = 502; val label = "unclassified"
  }

  private val madsLimit =
    """Monthly Active Data Streams limit(?: for application (?:&apos;|.)([^\(]*?)(?:&apos;|.)) \((\d+)""".r.unanchored
  private val ddpApp = """(?:,|\{)\.app=(.*?)(?:,|\})""".r.unanchored
  private val ddpLimit = """Current maximum rate is \((\d+)""".r.unanchored
  private val parseErrorAt = """<pre>\s*Parse error at &apos;(.*)&apos;</pre>""".r.unanchored
  private val forInputString = """<pre>\s*For input string: &quot;(.*)&quot;</pre>""".r.unanchored

  /** Ordered classification of a Warp 10 response body
    * (core/warp.go:280-421). `token` is the request token, carried into the
    * token-level errors for banishment.
    */
  def classify(body: String, token: String): WarpError = {
    if (body.contains("io.warp10.script.WarpScriptException: Invalid token"))
      InvalidToken(token)
    else if (body.contains("io.warp10.script.WarpScriptException: Write token missing"))
      InvalidToken("Write token missing")
    else if (body.contains("io.warp10.script.WarpScriptException: Token Expired"))
      ExpiredToken(token)
    else if (body.contains("io.warp10.script.WarpScriptException: Token revoked"))
      RevokedToken(token)
    else if (body.contains("exceed your Monthly Active Data Streams limit") ||
             body.contains("exceed the Monthly Active Data Streams limit")) {
      val (app, limit) = body.replace("\n", " ") match {
        case madsLimit(a, l) => (a, l)
        case _               => ("", "-1")
      }
      MadsExceeded(app, limit)
    } else if (body.contains("Daily Data Points limit being already exceeded")) {
      val app = body match { case ddpApp(a) => a; case _ => "" }
      val limit = body match { case ddpLimit(l) => l; case _ => "-1" }
      DdpExceeded(app, limit)
    } else if (body.contains("EOF"))
      InputError("error")
    else if (body.contains("Parse error at")) {
      val str = body match { case parseErrorAt(s) => s; case _ => "" }
      InputError(str)
    } else if (body.contains("Application suspended or closed"))
      GoneError("Application suspended or closed")
    else if (body.contains("For input string")) {
      val str = body match { case forInputString(s) => s; case _ => "" }
      InputError(str)
    } else if (body.contains("broken pipe"))
      BrokenPipe
    else
      Unclassified(body)
  }
}

/** Token extraction, faithful to core/auth.go:13-62 INCLUDING its error
  * paths: the three X-*-Token headers win outright; then the
  * Authorization header is split scheme+rest (absent/unsplittable →
  * error, never a fallback); `basic` with bad base64 or a colonless
  * credential is a HARD error; `bearer` takes the rest verbatim (even
  * empty — Go does); only an UNRECOGNIZED scheme reaches the `p`
  * query/form params, and their absence is an error.
  */
object TokenExtract {
  def fromRequest(
      warp10Header: Option[String],
      metricsHeader: Option[String],
      cityzenHeader: Option[String],
      authorization: Option[String],
      pQueryParam: Option[String],
      pFormParam: Option[String]): Either[String, String] = {
    def nonEmpty(o: Option[String]) = o.filter(_.nonEmpty)
    nonEmpty(warp10Header)
      .orElse(nonEmpty(metricsHeader))
      .orElse(nonEmpty(cityzenHeader)) match {
      case Some(t) => Right(t)
      case None =>
        val s = authorization.getOrElse("").split(" ", 2)
        if (s.length != 2) Left("missing basic auth bearer")
        else s(0).toLowerCase match {
          case "basic" =>
            val decoded =
              try Right(new String(java.util.Base64.getDecoder.decode(s(1)), "UTF-8"))
              catch { case _: IllegalArgumentException => Left("bad basic auth bearer") }
            decoded.flatMap { d =>
              val idx = d.indexOf(':')
              if (idx < 0) Left("unauthorized") else Right(d.substring(idx + 1))
            }
          case "bearer" => Right(s(1))
          case _ =>
            nonEmpty(pQueryParam).orElse(nonEmpty(pFormParam))
              .toRight("invalid Authorization header")
        }
    }
  }
}
