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

  test("token extraction precedence (core/auth.go:13-62)") {
    def b64(s: String) = java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))
    // warp10 header wins over everything
    assert(TokenExtract.fromParts(Some("w"), Some("m"), Some("c"), Some(b64("u:p")), Some("b"), Some("q"))
      == Some("w"))
    assert(TokenExtract.fromParts(None, Some("m"), Some("c"), None, None, None) == Some("m"))
    assert(TokenExtract.fromParts(None, None, Some("c"), None, None, None) == Some("c"))
    // Basic auth: password half
    assert(TokenExtract.fromParts(None, None, None, Some(b64("user:secret")), Some("b"), None)
      == Some("secret"))
    assert(TokenExtract.fromParts(None, None, None, None, Some("bear"), Some("q")) == Some("bear"))
    assert(TokenExtract.fromParts(None, None, None, None, None, Some("q")) == Some("q"))
    assert(TokenExtract.fromParts(None, None, None, None, None, None) == None)
    // invalid base64 / missing colon fall through
    assert(TokenExtract.fromParts(None, None, None, Some("!!!"), None, Some("q")) == Some("q"))
    assert(TokenExtract.fromParts(None, None, None, Some(b64("nocolon")), None, Some("q")) == Some("q"))
  }
}
