package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level (codegen-friendly, Catalyst-optimizable) twins of the
  * pure-Scala parser semantics — the SQL-expressible side of SURVEY.md §2
  * Table A. Kept as `Column` functions so they compose into any DataFrame
  * pipeline and stay inside whole-stage codegen (no UDFs in the hot path).
  */
object IngestSql {

  /** Graphite value-type inference cascade (catalyser/graphite.go:332-367):
    * float needs a '.', then int, then case-insensitive true/false bool,
    * else string. The float branch mirrors Go strconv.ParseFloat's
    * REJECTIONS that Java's cast would accept — trailing d/D/f/F
    * suffixes, embedded whitespace (try_cast trims), and 0x hex floats —
    * so this column twin and GraphiteParser.parseGoFloat classify
    * identically (agreement property-tested in ParserFuzzSpec).
    */
  def graphiteVtype(v: Column): Column = {
    val d = try_to_number_double(v)
    // Go strconv.ParseFloat RANGE errors (overflow to ±Inf, nonzero
    // mantissa underflowing to zero) fall through to string — try_cast
    // is silently Inf/0.0 there, so guard both (GraphiteParser twin)
    val mantissaNonzero = regexp_extract(v, "^([^eE]*)", 1).rlike("[1-9]")
    val goFloatOk = v.contains(".") &&
      !v.rlike("[dDfF]$") && !v.rlike("\\s") &&
      !v.contains("0x") && !v.contains("0X") &&
      d.isNotNull &&
      abs(d) =!= Double.PositiveInfinity &&
      !(d === 0.0d && mantissaNonzero)
    // long branch also needs the whitespace guard: try_cast trims, Go's
    // strconv.ParseInt does not
    when(goFloatOk, "double")
      .when(!v.rlike("\\s") && tryCastLong(v).isNotNull, "long")
      .when(lower(v).isin("true", "false"), "bool")
      .otherwise("string")
  }

  def tryCastDouble(v: Column): Column = v.try_cast("double")
  def tryCastLong(v: Column): Column = v.try_cast("bigint")
  private def try_to_number_double(v: Column): Column = v.try_cast("double")

  def graphiteVLong(v: Column): Column =
    when(graphiteVtype(v) === "long", tryCastLong(v)).otherwise(lit(null).cast("bigint"))

  def graphiteVDouble(v: Column): Column =
    when(graphiteVtype(v) === "double", tryCastDouble(v)).otherwise(lit(null).cast("double"))

  def graphiteVBool(v: Column): Column =
    when(graphiteVtype(v) === "bool", lower(v) === "true").otherwise(lit(null).cast("boolean"))

  def graphiteVString(v: Column): Column =
    when(graphiteVtype(v) === "string", v).otherwise(lit(null).cast("string"))

  /** Seconds-vs-millis-vs-zero epoch heuristic → µs
    * (catalyser/opentsdb.go:127-144); `nowUs` must be a fixed literal for
    * deterministic pipelines (streaming supplies current_timestamp-derived).
    */
  def normalizeEpochUs(raw: Column, nowUs: Column): Column =
    when(raw === 0L, nowUs)
      .when(raw < 4294967295L, raw * 1000000L)
      .otherwise(raw * 1000L)

  /** Canonical sorted `k=v,k2=v2` rendering of a label map — our
    * deterministic stand-in for the reference's nondeterministic Go map
    * iteration (core/warp.go:438-443).
    */
  def labelsCanonical(m: Column): Column =
    array_join(
      transform(array_sort(map_entries(m)), e => concat(e.getField("key"), lit("="), e.getField("value"))),
      ",")

  /** Sensision value rendering per type (core/warp.go:447-474): T/F bools,
    * Go %f (6-decimal fixed) doubles, plain longs, single-quoted strings.
    * URL-encoding of names/labels/strings is the Scala encoder's job
    * (graft.core.Sensision) — this column twin assumes already-safe input.
    */
  def sensisionValue(vtype: Column, vLong: Column, vDouble: Column, vBool: Column, vStr: Column): Column =
    when(vtype === "bool", when(vBool, "T").otherwise("F"))
      .when(vtype === "long", vLong.cast("string"))
      .when(vtype === "double", format_string("%f", vDouble))
      .otherwise(concat(lit("'"), vStr, lit("'")))

  /** Full Sensision line (column twin of Sensision.encode for pre-encoded /
    * safe names and canonical labels).
    */
  def sensisionLine(tsUs: Column, name: Column, labelsStr: Column,
      vtype: Column, vLong: Column, vDouble: Column, vBool: Column, vStr: Column): Column =
    concat(tsUs.cast("string"), lit("// "), name, lit("{"), labelsStr, lit("} "),
      sensisionValue(vtype, vLong, vDouble, vBool, vStr), lit("\r\n"))
}
