package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One registered operator: the Spark implementation plus (when
  * SQL-expressible) its DuckDB oracle twin. Column names/types must match
  * between the two — the driver sorts columns by name and hash-compares
  * values.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Canonical table access. Scale notes baked in here:
  *  - AQE on (runtime re-plan / skew-join splitting at cluster scale);
  *  - events' TIMESTAMP(NANOS) parquet needs nanosAsLong in Spark; the
  *    canonical cross-engine timestamp unit is MICROSECONDS (`ts_us`,
  *    also the GTS native unit — core/warp.go:45), because DuckDB
  *    truncates nanos parquet to µs on read.
  */
object Tables {

  def tune(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
  }

  // Plan-handle memo, NOT a result cache: spark.read.parquet resolves a
  // DataSource + lists the path + reads parquet footers for schema on
  // EVERY call, driver-side work each query re-pays inside its timed
  // region. The memo keys the resolved (lazy, unexecuted) DataFrame on
  // the session instance so repeated reads of the same static table
  // skip re-resolution; every action still scans the parquet fresh —
  // no data, no results, no persisted blocks live here. Weak keys: a
  // stopped test session releases its entries. Caveat: a harness that
  // OVERWRITES a parquet path and re-reads it through Tables.t in the
  // SAME session would see the stale file listing — the repo's
  // overwrite-then-reread sites (DevScale tiling, TrainerCoverageSpec
  // planted corpora) all use fresh dirs per generation.
  // GRAFT_NO_READ_MEMO=1 disables (the same-window A/B kill-switch).
  private val readMemo =
    new java.util.WeakHashMap[SparkSession, scala.collection.mutable.HashMap[String, DataFrame]]
  private val memoOff = sys.env.get("GRAFT_NO_READ_MEMO").contains("1")

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    tune(spark)
    if (memoOff) return spark.read.parquet(s"$dir/$name.parquet")
    val m = readMemo.synchronized {
      var inner = readMemo.get(spark)
      if (inner == null) { inner = scala.collection.mutable.HashMap.empty; readMemo.put(spark, inner) }
      inner
    }
    m.synchronized {
      m.getOrElseUpdate(s"$dir/$name", spark.read.parquet(s"$dir/$name.parquet"))
    }
  }

  /** events with canonical µs epoch column `ts_us` (DuckDB: epoch_us(ts)).
    * The driver's generator has shipped `ts` as TIMESTAMP(NANOS) (read as
    * LONG nanos under nanosAsLong) and as timestamp[us]; adapt on type so
    * both vintages of the testdata produce the identical µs-epoch bigint.
    * Session TZ is pinned UTC in [[tune]], so the NTZ cast is exact.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = t(spark, dir, "events")
    val tsUs = df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts DIV 1000")
      case org.apache.spark.sql.types.TimestampNTZType =>
        expr("unix_micros(cast(ts as timestamp))")
      case _ => expr("unix_micros(ts)")
    }
    df.withColumn("ts_us", tsUs)
  }
}
