package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of the batch `ts_cusum_alarm` operator — Page's
  * sequential CUSUM run the way SPC is actually deployed: the control
  * parameters (reference mean μ, slack k, threshold H — per key) are
  * FIXED from a training window, and the monitor folds live points into
  * hourly means and the two clamped sums as hours COMPLETE. The batch
  * query computes μ/MAD over the whole series in hindsight; the
  * streaming monitor takes those as the `refs` model (key → (μ, k, H),
  * model-sized, serialized into the processor) — set them to the
  * batch-computed values and the emitted rows are BIT-EXACT with the
  * batch rows over the same points.
  *
  * Per key the state is ONE open hour (h, n, Σcents) plus the running
  * (S⁺, S⁻) — five longs. A point in a LATER hour finalizes the open
  * hour: m = Σ ÷ n (truncated, the batch integer), S⁺ = max(0, S⁺ + m −
  * μ − k), S⁻ = max(0, S⁻ + μ − k − m), one output row with both alarm
  * flags; absent hours advance nothing, exactly like the batch fold
  * over PRESENT hours. Ordering contract: hours must arrive
  * non-decreasing (points within an hour in any order); a point for an
  * hour older than the open one is DROPPED — the watermark-shaped
  * staleness bound, same family as [[SloBurnLateProcessor]]. The final
  * open hour emits when a later-hour point (or heartbeat) arrives.
  */
class CusumProcessor(refs: Map[String, (Long, Long, Long)])
    extends StatefulProcessor[String, (String, Long, Long),
      (String, Long, Long, Long, Long, Boolean, Boolean)] {

  @transient private var st: ValueState[CusumProcessor.St] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[CusumProcessor.St](
      "cusum", Encoders.product[CusumProcessor.St], TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[(String, Long, Long)],
      timerValues: TimerValues): Iterator[(String, Long, Long, Long, Long, Boolean, Boolean)] = {
    val (mu, k, hh) = refs.getOrElse(key, (0L, 1L, Long.MaxValue))
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(String, Long, Long, Long, Long, Boolean, Boolean)]
    var s = if (st.exists()) st.get()
            else CusumProcessor.St(Long.MinValue, 0L, 0L, 0L, 0L)
    rows.toArray.sortBy(_._2).foreach { case (_, ts, cents) =>
      val hp = ts / 3600000000L
      if (s.h == Long.MinValue) s = s.copy(h = hp, n = 1L, sum = cents)
      else if (hp == s.h) s = s.copy(n = s.n + 1L, sum = s.sum + cents)
      else if (hp > s.h) {
        val m = s.sum / s.n
        val sh = math.max(0L, s.sh + m - mu - k)
        val sl = math.max(0L, s.sl + mu - k - m)
        out += ((key, s.h, m, sh, sl, sh > hh, sl > hh))
        s = CusumProcessor.St(hp, 1L, cents, sh, sl)
      }
      // hp < s.h: stale hour, dropped (ordering contract)
    }
    st.update(s)
    out.iterator
  }
}

object CusumProcessor {
  /** Per-key state: the open hour's accumulator + the running sums. */
  case class St(h: Long, n: Long, sum: Long, sh: Long, sl: Long)

  /** Rows: (key, ts_us, cents) → one row per COMPLETED (key, hour):
    * (key, h, mean_cents, cusum_hi, cusum_lo, alarm_hi, alarm_lo) —
    * the batch query's exact columns. `refs`: key → (μ, k, H).
    */
  def apply(
      spark: SparkSession,
      rows: Dataset[(String, Long, Long)],
      refs: Map[String, (Long, Long, Long)]): Dataset[(String, Long, Long, Long, Long, Boolean, Boolean)] = {
    import spark.implicits._
    SeriesStatsProcessor.configure(spark)
    rows.groupByKey(_._1)
      .transformWithState(new CusumProcessor(refs), TimeMode.None(), OutputMode.Update())
  }
}
