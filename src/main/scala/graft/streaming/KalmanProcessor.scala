package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of the batch `ts_kalman` operator: the SAME packed
  * fixed-point Kalman step ([[graft.ops.Series.kalmanStepLong]] — the
  * Long mirror of the SQL fold both engines run), applied per key as
  * points arrive. Because every step is exact integer arithmetic, a
  * stream that delivers each key's points in (ts, event_id) order
  * across micro-batches ends in the IDENTICAL packed state as the batch
  * sorted fold — bit-exact parity, not approximate agreement, the same
  * contract as [[EwmaProcessor]]/[[HoltProcessor]].
  *
  * State per key is ONE long (the packed (alarms, level, variance)
  * accumulator) plus the sample count — the smallest state of any
  * processor here, which is the operational point of a Kalman monitor:
  * optimal level tracking + a 3σ innovation alarm in 16 bytes per
  * series. Ordering contract: rows within a batch are sorted here;
  * across batches the caller feeds chronologically (watermark-shaped,
  * like every exact fold twin in this package).
  */
class KalmanProcessor
    extends StatefulProcessor[String, (String, Long, Long, Long),
      (String, Long, Long, Long, Long)] {

  @transient private var st: ValueState[KalmanProcessor.St] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[KalmanProcessor.St](
      "kalman", Encoders.product[KalmanProcessor.St], TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[(String, Long, Long, Long)],
      timerValues: TimerValues): Iterator[(String, Long, Long, Long, Long)] = {
    var s = if (st.exists()) st.get() else KalmanProcessor.St(0L, Long.MinValue)
    rows.toArray.sortBy(r => (r._2, r._3)).foreach { case (_, _, _, cents) =>
      require(cents >= 1L && cents <= 131071L,
        s"kalman fold domain: cents must be in [1, 131071], got $cents")
      s =
        if (s.acc == Long.MinValue) KalmanProcessor.St(1L, cents) // raw seed
        else KalmanProcessor.St(s.n + 1L, graft.ops.Series.kalmanStepLong(s.acc, cents))
    }
    st.update(s)
    if (s.n == 0L) Iterator.empty
    else {
      val (a, x, p) = graft.ops.Series.kalmanDecodeLong(s.acc)
      Iterator.single((key, s.n, a, x, p))
    }
  }
}

object KalmanProcessor {
  /** Per-key state: sample count + packed accumulator (Long.MinValue =
    * unseeded — raw cents are always ≥ 1, so the sentinel cannot
    * collide with a real state). */
  case class St(n: Long, acc: Long)

  /** Rows: (key, ts_us, event_id, cents) → per touched key per batch:
    * (key, n_points, nis_alarms, level_c, var_c2) — the batch
    * `ts_kalman` columns.
    */
  def apply(
      spark: SparkSession,
      rows: Dataset[(String, Long, Long, Long)]): Dataset[(String, Long, Long, Long, Long)] = {
    import spark.implicits._
    SeriesStatsProcessor.configure(spark)
    rows.groupByKey(_._1)
      .transformWithState(new KalmanProcessor, TimeMode.None(), OutputMode.Update())
  }
}
