package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of the batch `q_zscore_anomaly` operator: per-series
  * rolling z-score anomaly flags via transformWithState (v2 stateful
  * API, RocksDB-backed).
  *
  * State is a bounded ring of the last ≤ `window` values per series —
  * each point is scored against EXACTLY the batch operator's frame
  * (`ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING`: trailing window,
  * excluding self), then pushed into the ring, evicting the oldest.
  * True frame parity with `q_zscore_anomaly`: same sample stddev over
  * the same ≤20 trailing points, same guards (≥ `minHistory` history
  * rows, `round(sd,6) > 0`), same flag rule (`|round(z,6)| >
  * threshold`). State is O(window) doubles per series — bounded,
  * checkpointable, RocksDB-backed at scale.
  */
class AnomalyProcessor(threshold: Double = 3.0, minHistory: Int = 5, window: Int = 20)
    extends StatefulProcessor[String, (String, Double), (String, Double, Double, Boolean)] {
  import AnomalyProcessor.{Ring, round6}

  @transient private var st: ValueState[Ring] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[Ring](
      "anomalyRing", Encoders.product[Ring], TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[(String, Double)],
      timerValues: TimerValues): Iterator[(String, Double, Double, Boolean)] = {
    val hist0: Vector[Double] = if (st.exists()) st.get().values.toVector else Vector.empty
    // drain fully before updating state (the input iterator is lazy)
    val (hist, scored) =
      AnomalyProcessor.score(hist0, rows.map(_._2).toVector, threshold, minHistory, window)
    st.update(Ring(hist))
    scored.iterator.map { case (v, z, flag) => (key, v, z, flag) }
  }
}

object AnomalyProcessor {
  /** Bounded trailing-window state: last ≤window values, oldest first. */
  final case class Ring(values: Seq[Double])

  /** The frame-parity core, pure so the spec can check it against the
    * batch window directly: score each value against the trailing
    * ≤`window` history (self excluded), then push it into the ring.
    * Returns (new ring, per-value (value, z, flag)).
    */
  private[graft] def score(
      hist0: Vector[Double],
      vs: Seq[Double],
      threshold: Double,
      minHistory: Int,
      window: Int): (Vector[Double], Vector[(Double, Double, Boolean)]) = {
    var hist = hist0
    val out = vs.iterator.map { v =>
      val n = hist.length
      val mean = if (n > 0) hist.sum / n else 0.0
      val sd =
        if (n >= 2) math.sqrt(hist.iterator.map(x => (x - mean) * (x - mean)).sum / (n - 1))
        else 0.0
      val live = n >= minHistory && round6(sd) > 0
      val z = if (live) (v - mean) / sd else 0.0
      val flag = live && math.abs(round6(z)) > threshold
      hist = (hist :+ v).takeRight(window)
      (v, z, flag)
    }.toVector
    (hist, out)
  }

  /** Spark `round(x, 6)` twin (HALF_UP) so the streaming guards cut at
    * the same float edges as the batch query.
    */
  private[streaming] def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

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
