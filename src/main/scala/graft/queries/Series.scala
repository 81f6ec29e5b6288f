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

  def all: Seq[Q] = Seq(tsEwma, tsMadAnomaly, tsSeasonalProfile)

  /** Hour-of-day seasonality profile per event type: per-(type, hour)
    * volume and mean value, plus the hour's deviation from the type's
    * overall mean — the seasonal baseline a monitoring/anomaly stack
    * subtracts before thresholding. Means are computed from EXACT
    * integer cent sums (value has 2-decimal granularity), so no
    * cross-engine float-summation-order divergence is possible; the
    * only float ops are two final divisions of exact integers —
    * identical IEEE expressions both sides. Two partial-aggregated
    * shuffles (hour grid, then type totals), output is the tiny
    * profile grid.
    */
  val tsSeasonalProfile: Q = Q("ts_seasonal_profile", (s, dir) => {
    val e = Tables.events(s, dir)
      .withColumn("hr", expr("(ts_us DIV 3600000000) % 24"))
      .withColumn("cents", expr("CAST(round(value * 100) AS BIGINT)"))
    val byHour = e.groupBy("event_type", "hr")
      .agg(count(lit(1)).as("n"), sum("cents").as("sc"))
    val byType = byHour.groupBy("event_type")
      .agg(sum("sc").as("tc"), sum("n").as("tn"))
    byHour.join(byType, "event_type")
      .select(col("event_type"), col("hr"), col("n"),
        round(col("sc") / 100.0 / col("n"), 4).as("hour_mean"),
        round(col("sc") / 100.0 / col("n") - col("tc") / 100.0 / col("tn"), 4)
          .as("dev_from_type_mean"))
      .orderBy("event_type", "hr")
  }, Some("""WITH e AS (
      SELECT event_type, (epoch_us(ts) // 3600000000) % 24 AS hr,
        CAST(round(value * 100) AS BIGINT) AS cents
      FROM events),
    h AS (SELECT event_type, hr, count(*)::BIGINT AS n, sum(cents) AS sc
      FROM e GROUP BY event_type, hr),
    t AS (SELECT event_type, sum(sc) AS tc, sum(n) AS tn FROM h GROUP BY event_type)
    SELECT event_type, hr, n,
      round(sc / 100.0 / n, 4) AS hour_mean,
      round(sc / 100.0 / n - tc / 100.0 / tn, 4) AS dev_from_type_mean
    FROM h JOIN t USING (event_type)
    ORDER BY event_type, hr"""))

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
