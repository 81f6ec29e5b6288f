package graft.streaming

import graft.core.{Gts, GtsRow}
import graft.parsers.{GraphiteParser, InfluxLineParser, OpenTsdbParser, PromParser}
import org.apache.spark.sql.{Dataset, SparkSession}

/** Explicit bad-data policy — the reference diverges per transport
  * (graphite TCP skips bad lines, catalyser/graphite.go:276-283; graphite
  * HTTP aborts the request on the first bad line, graphite.go:49-56;
  * influx payloads are all-or-nothing). We surface the choice as a mode,
  * like Spark's JSON parser (SURVEY.md §2 gaps note).
  */
sealed trait ParseMode extends Serializable
object ParseMode {
  case object Permissive extends ParseMode // drop bad records
  case object FailFast extends ParseMode   // throw on the first bad record
}

final class GraftParseException(msg: String) extends RuntimeException(msg)

/** One typed flatMap ingest per wire protocol (SURVEY.md §2 Table A rows
  * A6-A21) — each turns a Dataset of payload strings (batch or streaming:
  * socket lines, file lines, Kafka values) into Dataset[GtsRow].
  */
object ProtocolIngest {

  private def handle[T](mode: ParseMode)(res: Either[String, Seq[Gts]]): Seq[GtsRow] =
    res match {
      case Right(gts) => gts.map(Gts.toRow)
      case Left(err) => mode match {
        case ParseMode.Permissive => Seq.empty
        case ParseMode.FailFast   => throw new GraftParseException(err)
      }
    }

  def graphite(
      spark: SparkSession, lines: Dataset[String],
      hierarchyLabels: Boolean, mode: ParseMode = ParseMode.Permissive): Dataset[GtsRow] = {
    import spark.implicits._
    lines.flatMap(l => handle(mode)(GraphiteParser.parseLine(l, hierarchyLabels).map(Seq(_))))
  }

  def influx(
      spark: SparkSession, lines: Dataset[String], precision: String,
      mode: ParseMode = ParseMode.FailFast): Dataset[GtsRow] = {
    import spark.implicits._
    lines.flatMap(l => handle(mode)(
      InfluxLineParser.parseLine(l, precision, System.currentTimeMillis() * 1000000L)))
  }

  def opentsdb(
      spark: SparkSession, bodies: Dataset[String],
      mode: ParseMode = ParseMode.FailFast): Dataset[GtsRow] = {
    import spark.implicits._
    bodies.flatMap(b => handle(mode)(
      OpenTsdbParser.parse(b, System.currentTimeMillis() * 1000L)))
  }

  def promExposition(
      spark: SparkSession, bodies: Dataset[String], extraLabels: Map[String, String],
      mode: ParseMode = ParseMode.FailFast): Dataset[GtsRow] = {
    import spark.implicits._
    bodies.flatMap(b => handle(mode)(
      PromParser.parseExposition(b, extraLabels, System.currentTimeMillis())))
  }

  /** Prometheus exposition with content negotiation (the full A17
    * surface): binary bodies + per-record content type; the delimited-
    * protobuf type routes to the MetricFamily wire decoder (histogram/
    * summary flattening included), anything else falls back to the text
    * grammar — exactly expfmt.ResponseFormat (prometheus.go:40-49).
    */
  def promExpositionNegotiated(
      spark: SparkSession, bodies: Dataset[(Array[Byte], String)],
      extraLabels: Map[String, String],
      mode: ParseMode = ParseMode.FailFast): Dataset[GtsRow] = {
    import spark.implicits._
    bodies.flatMap { case (body, contentType) =>
      handle(mode)(graft.parsers.PromProtoParser.parseExposition(
        body, Option(contentType), extraLabels, System.currentTimeMillis()))
    }
  }

  /** Remote-write: snappy-compressed protobuf WriteRequest bodies
    * (binary column, e.g. Kafka value) → GTS rows.
    */
  def promRemoteWrite(
      spark: SparkSession, bodies: Dataset[Array[Byte]],
      mode: ParseMode = ParseMode.FailFast): Dataset[GtsRow] = {
    import spark.implicits._
    bodies.flatMap(b => handle(mode)(graft.parsers.PrompbParser.parseSnappyBody(b)))
  }

  /** The InfluxDB protocol version the line-protocol ingest speaks
    * (catalyser/influxdb.go:17-18).
    */
  val InfluxDBVersion = "1.4.x"

  /** A33: the influx `/ping` liveness answer (catalyser/influxdb.go:53-57)
    * — 204 No Content, the fixed supported-version header, and the
    * request's txn id echoed back. Pure data: the serving layer maps it
    * onto whatever HTTP framework fronts the ingest.
    */
  final case class PingResponse(status: Int, headers: Map[String, String])

  def influxPing(txnId: String): PingResponse =
    PingResponse(204, Map(
      "X-Influxdb-Version" -> InfluxDBVersion,
      "Request-Id" -> txnId))
}
