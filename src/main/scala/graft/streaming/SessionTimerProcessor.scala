package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Event-time TIMER-driven session assembly (transformWithState v2):
  * the session closes when the WATERMARK passes `last event + gap`, not
  * when the next batch happens to arrive — the semantics
  * `session_window` gives declaratively, re-built on raw timers for
  * pipelines that need custom per-session state (running aggregates,
  * early emission, side effects on close).
  *
  * Per key: state = (session start, last event, count). Each input
  * extends the session and re-arms one timer at `last + gapMs`
  * (deleting the stale one). `handleExpiredTimer` emits the closed
  * session and clears state. Output rows appear ONLY on session close —
  * Append-mode, watermark-aligned, exactly the contract a downstream
  * sink wants. State is three longs per OPEN session, RocksDB-backed.
  */
class SessionTimerProcessor(gapMs: Long)
    extends StatefulProcessor[String, (String, Long), (String, Long, Long, Long)] {

  @transient private var sess: ValueState[(Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    sess = getHandle.getValueState[(Long, Long, Long)](
      "session", Encoders.product[(Long, Long, Long)], TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[(String, Long)],
      timerValues: TimerValues): Iterator[(String, Long, Long, Long)] = {
    var (start, last, n) = if (sess.exists()) sess.get() else (Long.MaxValue, Long.MinValue, 0L)
    val hadTimer = n > 0
    val oldExpiry = last + gapMs
    rows.foreach { case (_, ts) =>
      if (ts < start) start = ts
      if (ts > last) last = ts
      n += 1
    }
    if (hadTimer) getHandle.deleteTimer(oldExpiry)
    getHandle.registerTimer(last + gapMs)
    sess.update((start, last, n))
    Iterator.empty
  }

  override def handleExpiredTimer(
      key: String,
      timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[(String, Long, Long, Long)] = {
    if (!sess.exists()) return Iterator.empty
    val (start, last, n) = sess.get()
    sess.clear()
    Iterator.single((key, start, last, n))
  }
}

object SessionTimerProcessor {
  /** Keyed (key, eventTimeMs) stream → closed sessions
    * (key, startMs, endMs, count). `points` must already carry a
    * watermarked `eventTime` timestamp column.
    */
  def apply(
      spark: SparkSession,
      points: Dataset[(String, Long)],
      gapMs: Long): Dataset[(String, Long, Long, Long)] = {
    import spark.implicits._
    SeriesStatsProcessor.configure(spark)
    points.groupByKey(_._1)
      .transformWithState(new SessionTimerProcessor(gapMs), TimeMode.EventTime(),
        OutputMode.Append())
  }
}
