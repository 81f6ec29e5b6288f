package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of the batch `q_zscore_anomaly` operator: per-series
  * rolling z-score anomaly flags via transformWithState (v2 stateful
  * API, RocksDB-backed).
  *
  * State is the Welford running (n, mean, M2) of everything seen BEFORE
  * the current point — each point is scored against history, then folded
  * in, matching the batch operator's trailing-window-excluding-self
  * frame. O(1) state per series (three doubles), unbounded stream, no
  * window buffer: the shape that runs forever on a production metric
  * firehose. Guards mirror the batch query: ≥ `minHistory` points and
  * non-degenerate variance before any point can flag.
  */
class AnomalyProcessor(threshold: Double = 3.0, minHistory: Long = 5L)
    extends StatefulProcessor[String, (String, Double), (String, Double, Double, Boolean)] {

  @transient private var st: ValueState[(Long, Double, Double)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Long, Double, Double)](
      "anomalyStats", Encoders.product[(Long, Double, Double)], TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[(String, Double)],
      timerValues: TimerValues): Iterator[(String, Double, Double, Boolean)] = {
    var (n, mean, m2) = if (st.exists()) st.get() else (0L, 0.0, 0.0)
    val out = rows.map { case (_, v) =>
      // score against history only (sample stddev), then fold the point in
      val sd = if (n >= 2) math.sqrt(m2 / (n - 1)) else 0.0
      val z = if (n >= minHistory && sd > 0) (v - mean) / sd else 0.0
      val flag = n >= minHistory && sd > 0 && math.abs(z) > threshold
      n += 1
      val d = v - mean
      mean += d / n
      m2 += d * (v - mean)
      (key, v, z, flag)
    }.toVector // drain before updating state (iterator is lazy)
    st.update((n, mean, m2))
    out.iterator
  }
}

object AnomalyProcessor {
  /** Keyed stream of (series, value) → (series, value, z, is_anomaly). */
  def apply(spark: SparkSession, points: Dataset[(String, Double)],
      threshold: Double = 3.0): Dataset[(String, Double, Double, Boolean)] = {
    import spark.implicits._
    SeriesStatsProcessor.configure(spark)
    points.groupByKey(_._1)
      .transformWithState(new AnomalyProcessor(threshold), TimeMode.None(),
        OutputMode.Update())
  }
}
