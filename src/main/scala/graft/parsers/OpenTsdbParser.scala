package graft.parsers

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.core.{Gts, GtsValue}

import scala.jdk.CollectionConverters._

/** OpenTSDB JSON put parser (reference: catalyser/opentsdb.go).
  *
  * Accepts a single `{metric, timestamp, value, tags}` object or an array of
  * them; leading junk bytes before the first '[' or '{' are discarded
  * (opentsdb.go:37-58 sniffs the first bracket). Timestamps go through the
  * seconds-vs-millis heuristic (opentsdb.go:127-144). Go's encoding/json
  * decodes every JSON number into float64 (the `value interface{}` field,
  * opentsdb.go:19-28) so numeric values are always doubles here too.
  */
object OpenTsdbParser {

  private val mapper = new ObjectMapper()

  def parse(body: String, nowUs: Long): Either[String, Seq[Gts]] = {
    // discard leading junk until the first '[' or '{' (opentsdb.go:37-58)
    var start = 0
    while (start < body.length && body.charAt(start) != '[' && body.charAt(start) != '{') start += 1
    if (start >= body.length) return Left("Failed to parse datapoint: no JSON payload")
    val payload = body.substring(start)

    val root =
      try mapper.readTree(payload)
      catch { case e: Exception => return Left(s"Failed to parse datapoint: ${e.getMessage}") }

    val nodes: Seq[JsonNode] =
      if (root.isArray) root.elements().asScala.toSeq else Seq(root)

    val out = Seq.newBuilder[Gts]
    for (node <- nodes) {
      decodeOne(node, nowUs) match {
        case Left(err)  => return Left(err)
        case Right(gts) => out += gts
      }
    }
    Right(out.result())
  }

  private def decodeOne(node: JsonNode, nowUs: Long): Either[String, Gts] = {
    if (!node.isObject) return Left("Failed to parse datapoint: not an object")
    val metric = Option(node.get("metric")).map(_.asText()).getOrElse("")
    val tsRaw = Option(node.get("timestamp")).map(_.asLong(0L)).getOrElse(0L)
    val valueNode = node.get("value")
    val value: GtsValue = valueNode match {
      case null                   => GtsValue.double(0.0)
      case v if v.isNumber        => GtsValue.double(v.asDouble()) // Go json → float64
      case v if v.isBoolean       => GtsValue.bool(v.asBoolean())
      case v if v.isTextual       => GtsValue.string(v.asText())
      case v                      => GtsValue.string(v.toString)
    }
    val tags: Map[String, String] = Option(node.get("tags")) match {
      case Some(t) if t.isObject =>
        t.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
      case _ => Map.empty
    }
    Right(Gts(Some(Gts.normalizeEpochUs(tsRaw, nowUs)), metric, tags, value))
  }
}
