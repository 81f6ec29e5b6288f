package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Time-series smoothing / robust-outlier queries over the events table —
  * thin bindings of the generic [[graft.ops.Series]] primitives. The
  * reference's dataflow ends at its TSDB sink (core/warp.go:45 ships
  * series points); these are the first analytics a consumer of those
  * series runs.
  */
object Series {

  def all: Seq[Q] = Seq(tsEwma, tsMadAnomaly)

  /** Per-user EWMA level of `value` at two smoothing factors (α = 0.25,
    * 0.5), computed as a sorted sequential fold — bit-exact vs the
    * DuckDB `list_reduce` twin because both engines fold the identical
    * order with identical IEEE ops. One shuffle; fold is linear per
    * series inside the aggregate (no window, no O(n²)).
    */
  val tsEwma: Q = Q("ts_ewma", (s, dir) => {
    graft.ops.Series.ewmaLast(
      Tables.events(s, dir),
      keyCol = "user_id", orderCol = "ts_us", tieCol = "event_id",
      valCol = "value", alphas = Seq(0.25, 0.5))
      .select(col("user_id"), col("n_points"),
        round(col("ewma_25"), 4).as("ewma_25"),
        round(col("ewma_50"), 4).as("ewma_50"))
      .orderBy("user_id")
  }, Some(s"""SELECT user_id, count(*)::BIGINT AS n_points,
      round(${graft.ops.Series.ewmaSql("value", "ts_us, event_id", 0.25)}, 4) AS ewma_25,
      round(${graft.ops.Series.ewmaSql("value", "ts_us, event_id", 0.5)}, 4) AS ewma_50
    FROM (SELECT user_id, event_id, value, epoch_us(ts) AS ts_us FROM events)
    GROUP BY user_id ORDER BY user_id"""))

  /** Robust anomaly detection: per-event-type median/MAD, flag rows with
    * robust z-score > 3. The MAD-based twin of q_zscore_anomaly —
    * resistant to the outliers it is hunting (mean/σ are dragged by the
    * very points being flagged; median/MAD are not). Exact interpolated
    * percentiles both sides; boundary rows pinned by round(score, 6)
    * before the threshold compare.
    */
  val tsMadAnomaly: Q = Q("ts_mad_anomaly", (s, dir) => {
    graft.ops.Series.madOutliers(
      Tables.t(s, dir, "events"), keyCol = "event_type", valCol = "value", k = 3.0)
      .select(col("event_id"), col("event_type"), col("value"),
        round(col("med"), 4).as("med"), round(col("mad"), 4).as("mad"),
        round(col("mad_score"), 4).as("mad_score"))
      .orderBy("event_id")
  }, Some("""WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type),
    dev AS (
      SELECT e.event_id, e.event_type, e.value, med.med,
        abs(e.value - med.med) AS dev
      FROM events e JOIN med USING (event_type)),
    mad AS (
      SELECT event_type, quantile_cont(dev, 0.5) AS mad
      FROM dev GROUP BY event_type)
    SELECT event_id, event_type, value, round(med, 4) AS med,
      round(mad, 4) AS mad,
      round(dev / (mad * 1.4826), 4) AS mad_score
    FROM dev JOIN mad USING (event_type)
    WHERE mad > 0 AND round(dev / (mad * 1.4826), 6) > 3.0
    ORDER BY event_id"""))
}
