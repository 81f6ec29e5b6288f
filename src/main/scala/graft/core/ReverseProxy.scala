package graft.core

import java.io.{ByteArrayOutputStream, IOException, InputStream}
import java.net.{HttpURLConnection, URI}

/** The reference's reverse-proxy READ path (`middlewares/reverse.go:18-67`,
  * routes `cmd/root.go:139-145`) — the one Table-A row previously covered
  * only "by design": catalyst forwards every non-update `/warp/api/v0/…`
  * request (fetch, exec, meta…) to the backing Warp 10, and the delete
  * subtree to a dedicated endpoint with a FIXED upstream path.
  * Faithful semantics, each pinned in ReverseProxySpec against a real
  * local upstream:
  *
  *   - upstream URI = `config.url + "/" + wildcard`, UNLESS `config.path`
  *     is set — then `config.url + config.path` and the wildcard is
  *     ignored entirely (`reverse.go:21-24`);
  *   - the query string is spliced from the FIRST `'?'` of the raw
  *     request URI, verbatim — later `'?'`s ride along inside it
  *     (`reverse.go:25-28`);
  *   - request headers pass through unchanged (`reverse.go:45`);
  *   - of the upstream's response headers, ONLY those whose canonical
  *     MIME form starts with `X-Warp` are copied back, FIRST value only
  *     (`reverse.go:52-56`);
  *   - transport failure → 502 with an empty body; a malformed target
  *     URI → 500 with the error text (`reverse.go:41-43,48-50`); any
  *     other upstream status streams through as-is with the upstream's
  *     Content-Type.
  */
object ReverseProxy {

  /** `ReverseConfig` from `reverse.go:13-16`: `path` empty means "append
    * the route wildcard"; non-empty pins the upstream path.
    */
  case class ReverseConfig(url: String, path: String = "")

  /** A request as the route handler sees it: the raw request URI (for
    * the verbatim query splice), the `*` route param, the method,
    * headers in arrival order, and the body bytes.
    */
  case class ProxyRequest(
      method: String,
      requestUri: String,
      wildcard: String,
      headers: Seq[(String, String)] = Seq.empty,
      body: Array[Byte] = Array.empty)

  /** What goes back to the client: status, upstream Content-Type (empty
    * when the upstream sent none), the filtered `X-Warp*` headers, body.
    */
  case class ProxyResponse(
      status: Int,
      contentType: String,
      headers: Seq[(String, String)],
      body: Array[Byte])

  /** Go's `textproto.CanonicalMIMEHeaderKey`: dash-separated segments,
    * first letter upper, rest lower — the form `reverse.go:53` prefix-
    * matches against, which is what makes the `X-Warp` filter effectively
    * case-insensitive on wire headers.
    */
  def canonicalHeaderKey(k: String): String =
    k.split("-", -1).map { seg =>
      if (seg.isEmpty) seg
      else seg.head.toUpper +: seg.tail.map(_.toLower)
    }.mkString("-")

  /** The upstream URI per `reverse.go:20-28`. */
  def targetUri(config: ReverseConfig, req: ProxyRequest): String = {
    val base =
      if (config.path.nonEmpty) config.url + config.path
      else config.url + "/" + req.wildcard
    val q = req.requestUri.indexOf('?')
    if (q >= 0) base + req.requestUri.substring(q) else base
  }

  /** The two read routes of `cmd/root.go:139-145`, echo-style longest-
    * prefix matching: the delete subtree (fixed upstream path `/delete`
    * on the delete endpoint) beats the `/warp/api/v0/…` catch-all. Returns
    * the matched config and the `*` param, or None for paths the read
    * router does not own (those are ingest handlers, not proxies).
    */
  def route(
      path: String,
      warpEndpoint: String,
      warpEndpointDelete: String): Option[(ReverseConfig, String)] = {
    val deletePrefix = "/warp/api/v0/delete"
    val anyPrefix = "/warp/api/v0/"
    val updatePrefix = "/warp/api/v0/update"
    if (path.startsWith(deletePrefix))
      Some((ReverseConfig(warpEndpointDelete + "/api/v0", "/delete"),
        path.substring(deletePrefix.length)))
    else if (path.startsWith(updatePrefix)) None // ingest handler, not proxied
    else if (path.startsWith(anyPrefix))
      Some((ReverseConfig(warpEndpoint + "/api/v0"),
        path.substring(anyPrefix.length)))
    else None
  }

  private def readAll(in: InputStream): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    in.close()
    out.toByteArray
  }

  /** Execute the proxy hop. Blocking, one upstream request — the read
    * path is a pass-through, not a data-plane operator; Spark never
    * sees these bytes.
    */
  def forward(config: ReverseConfig, req: ProxyRequest): ProxyResponse = {
    val uri = targetUri(config, req)
    val conn =
      try new URI(uri).toURL.openConnection().asInstanceOf[HttpURLConnection]
      catch {
        case e: Exception => // request-build failure → 500 + error text
          return ProxyResponse(500, "text/plain",
            Seq.empty, e.getMessage.getBytes("UTF-8"))
      }
    try {
      conn.setRequestMethod(req.method)
      conn.setInstanceFollowRedirects(false)
      req.headers.foreach { case (k, v) => conn.addRequestProperty(k, v) }
      if (req.body.nonEmpty) {
        conn.setDoOutput(true)
        val os = conn.getOutputStream
        os.write(req.body); os.close()
      }
      val status = conn.getResponseCode
      val xwarp = {
        // reverse.go returns Header[k][0] — the FIRST value on the wire for
        // a repeated header. Walk getHeaderFieldKey/getHeaderField by index
        // (wire order per JDK contract) instead of getHeaderFields, whose
        // per-key value ordering is undocumented.
        val firstByKey = scala.collection.mutable.LinkedHashMap.empty[String, String]
        var i = 0
        var done = false
        while (!done) {
          val k = conn.getHeaderFieldKey(i)
          val v = conn.getHeaderField(i)
          if (k == null && v == null) done = true
          else if (k != null && v != null) {
            val ck = canonicalHeaderKey(k)
            if (ck.startsWith("X-Warp") && !firstByKey.contains(ck)) firstByKey(ck) = v
          }
          i += 1
        }
        firstByKey.toSeq.sortBy(_._1)
      }
      val contentType = Option(conn.getContentType).getOrElse("")
      val body = readAll(
        if (status >= 400) Option(conn.getErrorStream)
          .getOrElse(InputStream.nullInputStream())
        else conn.getInputStream)
      ProxyResponse(status, contentType, xwarp, body)
    } catch {
      case _: IOException => ProxyResponse(502, "", Seq.empty, Array.empty)
    } finally conn.disconnect()
  }
}
