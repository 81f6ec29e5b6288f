package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of the batch `ts_counter_rate` operator — the
  * recording rule a Prometheus-shaped engine actually evaluates online:
  * per series the monitor keeps the LAST counter reading and the open
  * hour's (increase, resets, samples); each arriving sample contributes
  * its reset-corrected delta (delta ≥ 0 ? delta : value — the promql
  * counter-reset rule), and a sample in a later hour emits the
  * completed hour's row. Because every step is integer arithmetic on
  * the same synthesized counter (running cent sum mod 10⁶ — the caller
  * passes counter READINGS, this processor never re-derives them), the
  * emitted rows are BIT-EXACT with the batch query over the same
  * points, including rate_e4 = increase·10⁴ ÷ 3600.
  *
  * State per key: open hour h, samples n, increase, resets, last
  * counter reading — five longs. Ordering contract as
  * [[CusumProcessor]]: hours non-decreasing across batches, in-hour
  * order by (ts, seq) restored by the per-batch sort, stale hours
  * dropped, final open hour flushed by a later-hour sentinel.
  */
class CounterRateProcessor
    extends StatefulProcessor[String, (String, Long, Long, Long),
      (String, Long, Long, Long, Long, Long)] {

  @transient private var st: ValueState[CounterRateProcessor.St] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[CounterRateProcessor.St](
      "ctr_rate", Encoders.product[CounterRateProcessor.St], TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[(String, Long, Long, Long)],
      timerValues: TimerValues): Iterator[(String, Long, Long, Long, Long, Long)] = {
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(String, Long, Long, Long, Long, Long)]
    var s = if (st.exists()) st.get()
            else CounterRateProcessor.St(Long.MinValue, 0L, 0L, 0L, Long.MinValue)
    rows.toArray.sortBy(r => (r._2, r._3)).foreach { case (_, ts, _, ctr) =>
      val hp = ts / 3600000000L
      if (s.h == Long.MinValue) s = s.copy(h = hp)
      else if (hp > s.h) {
        out += ((key, s.h, s.n, s.inc, s.resets,
          s.inc * 10000L / 3600L))
        s = s.copy(h = hp, n = 0L, inc = 0L, resets = 0L)
      }
      if (hp >= s.h) {
        val (dInc, dReset) =
          if (s.last == Long.MinValue) (0L, 0L) // first sample: no delta
          else if (ctr >= s.last) (ctr - s.last, 0L)
          else (ctr, 1L) // reset: the reading IS the contribution
        s = s.copy(n = s.n + 1L, inc = s.inc + dInc,
          resets = s.resets + dReset, last = ctr)
      }
      // hp < s.h: stale hour, dropped (ordering contract)
    }
    st.update(s)
    out.iterator
  }
}

object CounterRateProcessor {
  /** Per-key state: open hour accumulator + last counter reading
    * (Long.MinValue sentinels = none yet). */
  case class St(h: Long, n: Long, inc: Long, resets: Long, last: Long)

  /** Rows: (key, ts_us, seq, counter_reading) → one row per COMPLETED
    * (key, hour): (key, h, samples, increase_cents, resets, rate_e4) —
    * the batch `ts_counter_rate` columns.
    */
  def apply(
      spark: SparkSession,
      rows: Dataset[(String, Long, Long, Long)]): Dataset[(String, Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    SeriesStatsProcessor.configure(spark)
    rows.groupByKey(_._1)
      .transformWithState(new CounterRateProcessor, TimeMode.None(), OutputMode.Update())
  }
}
