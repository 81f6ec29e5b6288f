package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of the batch `ts_alert_for` operator — the
  * Prometheus `for:` duration state machine run the way an alerting
  * engine actually runs it: hourly evaluations fold live points into
  * the open hour's mean, and when an hour COMPLETES its condition
  * (mean ≥ 50.00) either extends the pending/firing streak or resets
  * it. The streak continues ONLY if the immediately-previous HOUR was
  * a condition-true evaluation — a skipped hour (no samples) or a
  * false evaluation resets, exactly the batch query's gaps-and-islands
  * semantics, so the emitted (key, h, mean, streak, state) rows are
  * BIT-EXACT with the batch rows over the same points.
  *
  * Per key the state is the open hour (h, n, Σcents), the hour of the
  * last condition-true evaluation and the running streak — five longs.
  * Ordering contract as [[CusumProcessor]]: hours arrive non-
  * decreasing (in-hour order free), stale hours drop, the final open
  * hour emits when a later-hour point (or sentinel heartbeat) arrives.
  */
class AlertForProcessor
    extends StatefulProcessor[String, (String, Long, Long),
      (String, Long, Long, Long, String)] {

  @transient private var st: ValueState[AlertForProcessor.St] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[AlertForProcessor.St](
      "alertfor", Encoders.product[AlertForProcessor.St], TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[(String, Long, Long)],
      timerValues: TimerValues): Iterator[(String, Long, Long, Long, String)] = {
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(String, Long, Long, Long, String)]
    var s = if (st.exists()) st.get()
            else AlertForProcessor.St(Long.MinValue, 0L, 0L, Long.MinValue, 0L)

    def close(hp: Long): Unit = { // finalize the open hour, open hp
      val m = s.sum / s.n
      if (m >= 5000L) {
        val streak = if (s.lastCondH == s.h - 1L) s.streak + 1L else 1L
        out += ((key, s.h, m, streak, if (streak >= 3L) "firing" else "pending"))
        s = s.copy(lastCondH = s.h, streak = streak)
      }
      s = s.copy(h = hp, n = 0L, sum = 0L)
    }

    rows.toArray.sortBy(_._2).foreach { case (_, ts, cents) =>
      val hp = ts / 3600000000L
      if (s.h == Long.MinValue) s = s.copy(h = hp)
      else if (hp > s.h) close(hp)
      if (hp >= s.h) s = s.copy(n = s.n + 1L, sum = s.sum + cents)
      // hp < s.h: stale hour, dropped (ordering contract)
    }
    st.update(s)
    out.iterator
  }
}

object AlertForProcessor {
  /** Per-key state: open hour accumulator + last cond-true hour and
    * its streak (Long.MinValue sentinels = none yet). */
  case class St(h: Long, n: Long, sum: Long, lastCondH: Long, streak: Long)

  /** Rows: (key, ts_us, cents) → one row per COMPLETED cond-true
    * (key, hour): (key, h, mean_c, streak, state) — the batch
    * `ts_alert_for` columns.
    */
  def apply(
      spark: SparkSession,
      rows: Dataset[(String, Long, Long)]): Dataset[(String, Long, Long, Long, String)] = {
    import spark.implicits._
    SeriesStatsProcessor.configure(spark)
    rows.groupByKey(_._1)
      .transformWithState(new AlertForProcessor, TimeMode.None(), OutputMode.Update())
  }
}
