package graft

import graft.core.{TokenExtract, WarpError}
import org.scalatest.funsuite.AnyFunSuite

/** Warp error classification order + HTTP mapping (core/warp.go:280-421,
  * core/handler.go:210-459) and token extraction precedence
  * (core/auth.go:13-62).
  */
class WarpErrorsSpec extends AnyFunSuite {
  import WarpError._

  test("token errors classify and ban") {
    val e = classify("io.warp10.script.WarpScriptException: Invalid token blah", "tok1")
    assert(e == InvalidToken("tok1") && e.httpStatus == 401 && e.bansToken)
    assert(classify("io.warp10.script.WarpScriptException: Write token missing", "t")
      == InvalidToken("Write token missing"))
    assert(classify("io.warp10.script.WarpScriptException: Token Expired", "t").httpStatus == 401)
    assert(classify("io.warp10.script.WarpScriptException: Token revoked", "t")
      == RevokedToken("t"))
  }

  test("MADS and DDP limits -> 429 with extracted app/limit") {
    val mads = classify(
      "You exceed your Monthly Active Data Streams limit for application 'myapp' (100). (Geo Time Series", "t")
    assert(mads.httpStatus == 429)
    assert(mads.asInstanceOf[MadsExceeded].limit == "100")
    val ddp = classify(
      "oops {.app=other,} Daily Data Points limit being already exceeded. Current maximum rate is (50) datapoints/s", "t")
    assert(ddp.httpStatus == 429)
    assert(ddp.asInstanceOf[DdpExceeded].limit == "50")
  }

  test("parse errors -> 422 with extracted fragment; order: EOF first") {
    val p = classify("<pre> Parse error at &apos;bad input&apos;</pre>", "t")
    assert(p == InputError("bad input") && p.httpStatus == 422)
    // EOF branch fires before 'Parse error at' (warp.go:358-362)
    assert(classify("EOF while Parse error at &apos;x&apos;", "t") == InputError("error"))
    val f = classify("<pre> For input string: &quot;12x&quot;</pre>", "t")
    assert(f == InputError("12x"))
  }

  test("gone / broken pipe / unclassified") {
    assert(classify("Application suspended or closed", "t").httpStatus == 410)
    assert(classify("write tcp 1.2.3.4: broken pipe", "t") == BrokenPipe)
    assert(classify("something else entirely", "t").httpStatus == 502)
  }

  test("first match wins: invalid token beats later patterns") {
    val both = "io.warp10.script.WarpScriptException: Invalid token and Parse error at &apos;x&apos;"
    assert(classify(both, "t") == InvalidToken("t"))
  }

  test("token extraction precedence and error paths (core/auth.go:13-62)") {
    def b64(s: String) = java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))
    def basic(cred: String) = Some("Basic " + b64(cred))
    // warp10 header wins over everything
    assert(TokenExtract.fromRequest(Some("w"), Some("m"), Some("c"), basic("u:p"), Some("q"), None)
      == Right("w"))
    assert(TokenExtract.fromRequest(None, Some("m"), Some("c"), None, None, None) == Right("m"))
    assert(TokenExtract.fromRequest(None, None, Some("c"), None, None, None) == Right("c"))
    // Basic auth: password half (scheme is case-insensitive in Go's strings.ToLower)
    assert(TokenExtract.fromRequest(None, None, None, basic("user:secret"), None, None)
      == Right("secret"))
    assert(TokenExtract.fromRequest(None, None, None, Some("basic " + b64("u:p")), None, None)
      == Right("p"))
    // Bearer takes the rest verbatim
    assert(TokenExtract.fromRequest(None, None, None, Some("Bearer bear"), Some("q"), None)
      == Right("bear"))
    // p params are reachable ONLY via an unrecognized Authorization scheme
    assert(TokenExtract.fromRequest(None, None, None, Some("Token xyz"), Some("q"), None)
      == Right("q"))
    assert(TokenExtract.fromRequest(None, None, None, Some("Token xyz"), None, Some("pf"))
      == Right("pf"))
    assert(TokenExtract.fromRequest(None, None, None, Some("Token xyz"), None, None)
      == Left("invalid Authorization header"))
    // no Authorization header at all = hard error, not a p fallback
    assert(TokenExtract.fromRequest(None, None, None, None, Some("q"), None)
      == Left("missing basic auth bearer"))
    // malformed Basic credentials are HARD errors (the reference rejects)
    assert(TokenExtract.fromRequest(None, None, None, Some("Basic !!!"), Some("q"), None)
      == Left("bad basic auth bearer"))
    assert(TokenExtract.fromRequest(None, None, None, basic("nocolon"), Some("q"), None)
      == Left("unauthorized"))
  }
}
