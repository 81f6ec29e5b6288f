package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of the batch `ts_page_hinkley` drift detector — the
  * Page–Hinkley test the way a monitor actually runs it: ONE pass, no
  * training window, the running mean tracked inline. Unlike
  * [[CusumProcessor]] (whose μ/k/H come from a hindsight model), PH is
  * genuinely self-contained — the batch query's prefix sums
  * (t, S_t, m_t, min m) ARE the streaming state, so the twin carries
  * them verbatim and the final emitted row per key reproduces the
  * batch aggregate (n_hours, ph_max, n_alarm_hours, first_alarm_h)
  * BIT-EXACT: every step is integer (one truncating division per
  * completed hour — Java `/` ≡ Spark DIV ≡ DuckDB `//` on the
  * non-negative sums here), so no float drift path exists.
  *
  * Per key the state is the ONE open hour (h, n, Σcents) plus seven
  * longs of PH state — O(1), never data-sized. A point in a LATER hour
  * finalizes the open hour: c = Σ ÷ n, t += 1, S += c,
  * m += c − S ÷ t − δ, ph = m − min m, alarm when ph > λ; one row with
  * the running aggregates is emitted per completed hour (the LAST row
  * per key is the batch answer). Ordering contract: hours arrive
  * non-decreasing across micro-batches (intra-batch order is sorted
  * away); stale hours are dropped, the same watermark-shaped bound as
  * [[CusumProcessor]] / [[SloBurnLateProcessor]].
  */
class PageHinkleyProcessor(delta: Long, lambda: Long)
    extends StatefulProcessor[String, (String, Long, Long),
      (String, Long, Long, Long, Long, Long, Long, Long)] {

  @transient private var st: ValueState[PageHinkleyProcessor.St] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[PageHinkleyProcessor.St](
      "ph", Encoders.product[PageHinkleyProcessor.St], TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[(String, Long, Long)],
      timerValues: TimerValues): Iterator[(String, Long, Long, Long, Long, Long, Long, Long)] = {
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(String, Long, Long, Long, Long, Long, Long, Long)]
    var s = if (st.exists()) st.get()
            else PageHinkleyProcessor.St(Long.MinValue, 0L, 0L,
              0L, 0L, 0L, Long.MaxValue, 0L, 0L, -1L)
    def finishHour(): Unit = {
      val c = s.sum / s.n
      val t = s.t + 1L
      val cs = s.cs + c
      val m = s.m + (c - cs / t - delta)
      val mmin = math.min(s.mmin, m)
      val ph = m - mmin
      val phMax = math.max(s.phMax, ph)
      val alarm = ph > lambda
      val nAlarm = s.nAlarm + (if (alarm) 1L else 0L)
      val firstAlarmH = if (alarm && s.firstAlarmH == -1L) s.h else s.firstAlarmH
      out += ((key, s.h, c, t, ph, phMax, nAlarm, firstAlarmH))
      s = s.copy(t = t, cs = cs, m = m, mmin = mmin,
        phMax = phMax, nAlarm = nAlarm, firstAlarmH = firstAlarmH)
    }
    rows.toArray.sortBy(_._2).foreach { case (_, ts, cents) =>
      val hp = ts / 3600000000L
      if (s.h == Long.MinValue) s = s.copy(h = hp, n = 1L, sum = cents)
      else if (hp == s.h) s = s.copy(n = s.n + 1L, sum = s.sum + cents)
      else if (hp > s.h) {
        finishHour()
        s = s.copy(h = hp, n = 1L, sum = cents)
      }
      // hp < s.h: stale hour, dropped (ordering contract)
    }
    st.update(s)
    out.iterator
  }
}

object PageHinkleyProcessor {
  /** Per-key state: the open hour's accumulator (h, n, sum) + the PH
    * prefix state — t completed hours, cs = Σc, m, min m, max ph,
    * alarm count, first alarm hour (−1 = none yet).
    */
  case class St(h: Long, n: Long, sum: Long, t: Long, cs: Long, m: Long,
      mmin: Long, phMax: Long, nAlarm: Long, firstAlarmH: Long)

  /** Rows: (key, ts_us, cents) → one row per COMPLETED (key, hour):
    * (key, h, mean_cents, n_hours, ph, ph_max, n_alarm_hours,
    * first_alarm_h) — the running aggregates; the last row per key
    * matches the batch `ts_page_hinkley` row (first_alarm_h = −1 for
    * the batch NULL). δ and λ default to the batch query's 500/10000.
    */
  def apply(
      spark: SparkSession,
      rows: Dataset[(String, Long, Long)],
      delta: Long = 500L,
      lambda: Long = 10000L): Dataset[(String, Long, Long, Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    SeriesStatsProcessor.configure(spark)
    rows.groupByKey(_._1)
      .transformWithState(new PageHinkleyProcessor(delta, lambda),
        TimeMode.None(), OutputMode.Update())
  }
}
