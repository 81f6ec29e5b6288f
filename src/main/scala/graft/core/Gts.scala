package graft.core

/** Polymorphic GTS value — a tagged union standing in for the reference's
  * `interface{}` value slot (reference: core/warp.go:40-45, value type
  * switch core/warp.go:447-474). The reference's parsers only ever produce
  * bool / int64 / float64 / string (float32 / int are declared but
  * unreachable), so those four are the union.
  */
sealed trait GtsValue extends Product with Serializable {
  /** Tag used by the columnar (DataFrame) representation. */
  def vtype: String = this match {
    case _: GtsValue.GtsLong   => "long"
    case _: GtsValue.GtsDouble => "double"
    case _: GtsValue.GtsBool   => "bool"
    case _: GtsValue.GtsString => "string"
  }
}
object GtsValue {
  final case class GtsLong(v: Long)      extends GtsValue
  final case class GtsDouble(v: Double)  extends GtsValue
  final case class GtsBool(v: Boolean)   extends GtsValue
  final case class GtsString(v: String)  extends GtsValue

  def long(v: Long): GtsValue      = GtsLong(v)
  def double(v: Double): GtsValue  = GtsDouble(v)
  def bool(v: Boolean): GtsValue   = GtsBool(v)
  def string(v: String): GtsValue  = GtsString(v)
}

/** One Geo Time Series point (reference: core/warp.go:40-45).
  *
  * @param ts     timestamp in MICROSECONDS since epoch; None = "no
  *               timestamp" (the reference uses NaN, core/warp.go:429-431)
  * @param name   metric class name
  * @param labels free-form string→string tags
  * @param value  polymorphic scalar
  */
final case class Gts(
    ts: Option[Long],
    name: String,
    labels: Map[String, String],
    value: GtsValue)

object Gts {
  /** Seconds-vs-millis cutoff (reference: catalyser/opentsdb.go:135-141;
    * note strictly-less-than, 0xFFFFFFFF itself is millis).
    */
  val SecondsCutoff: Long = 0xFFFFFFFFL

  /** The reference's `int64toTime` heuristic normalized to µs
    * (catalyser/opentsdb.go:127-144, also used by graphite.go:370):
    * 0 → now; < 0xFFFFFFFF → seconds; else milliseconds. Negative values
    * compare < 0xFFFFFFFF and are therefore treated as (negative) seconds,
    * matching the Go signed comparison.
    */
  def normalizeEpochUs(ts: Long, nowUs: => Long): Long =
    if (ts == 0L) nowUs
    else if (ts < SecondsCutoff) ts * 1000000L
    else ts * 1000L

  def nowUs(): Long = System.currentTimeMillis() * 1000L

  /** Flat row shape used for `Dataset[GtsRow]` — the tagged union becomes
    * four nullable typed columns plus a `vtype` discriminant (SURVEY.md
    * §1.4 / §7.4 decision).
    */
  def toRow(g: Gts): GtsRow = {
    val (vl, vd, vb, vs) = g.value match {
      case GtsValue.GtsLong(v)   => (Some(v), None, None, None)
      case GtsValue.GtsDouble(v) => (None, Some(v), None, None)
      case GtsValue.GtsBool(v)   => (None, None, Some(v), None)
      case GtsValue.GtsString(v) => (None, None, None, Some(v))
    }
    GtsRow(g.ts, g.name, g.labels, g.value.vtype, vl, vd, vb, vs)
  }
}

/** Columnar twin of [[Gts]] with the value union flattened to nullable
  * typed columns; `Encoder`-friendly for `Dataset[GtsRow]`.
  */
final case class GtsRow(
    ts_us: Option[Long],
    name: String,
    labels: Map[String, String],
    vtype: String,
    v_long: Option[Long],
    v_double: Option[Double],
    v_bool: Option[Boolean],
    v_str: Option[String]) {

  def toGts: Gts = {
    val value = vtype match {
      case "long"   => GtsValue.GtsLong(v_long.get)
      case "double" => GtsValue.GtsDouble(v_double.get)
      case "bool"   => GtsValue.GtsBool(v_bool.get)
      case _        => GtsValue.GtsString(v_str.get)
    }
    Gts(ts_us, name, labels, value)
  }
}
