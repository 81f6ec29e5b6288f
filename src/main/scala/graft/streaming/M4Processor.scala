package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of the batch `ts_downsample_m4` operator — the M4
  * min/max/first/last pixel-bucket downsample maintained online, which
  * is how a live dashboard backend actually serves it (Grafana-style
  * streaming rollup): each arriving point folds into the open 10-hour
  * bucket's five-long state; a point in a later bucket emits the
  * completed bucket's row. min/max are order-free; first/last follow
  * the same unique (ts, event_id) total order the batch query resolves
  * by row_number, restored per batch by the sort and preserved across
  * batches by the chronological-feed contract — so the emitted rows
  * are BIT-EXACT with the batch ones.
  *
  * State per key: open bucket b, n, min, max, first, last — six longs.
  * Ordering contract as [[CusumProcessor]]: buckets non-decreasing,
  * stale buckets dropped, final open bucket flushed by a later-bucket
  * sentinel.
  */
class M4Processor
    extends StatefulProcessor[String, (String, Long, Long, Long),
      (String, Long, Long, Long, Long, Long, Long)] {

  @transient private var st: ValueState[M4Processor.St] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[M4Processor.St](
      "m4", Encoders.product[M4Processor.St], TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[(String, Long, Long, Long)],
      timerValues: TimerValues): Iterator[(String, Long, Long, Long, Long, Long, Long)] = {
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(String, Long, Long, Long, Long, Long, Long)]
    var s = if (st.exists()) st.get()
            else M4Processor.St(Long.MinValue, 0L, 0L, 0L, 0L, 0L)
    rows.toArray.sortBy(r => (r._2, r._3)).foreach { case (_, ts, _, c) =>
      val b = ts / 36000000000L
      if (s.b == Long.MinValue || b > s.b) {
        if (s.b != Long.MinValue && b > s.b)
          out += ((key, s.b, s.n, s.mn, s.mx, s.first, s.last))
        s = M4Processor.St(b, 1L, c, c, c, c)
      } else if (b == s.b) {
        s = s.copy(n = s.n + 1L, mn = math.min(s.mn, c),
          mx = math.max(s.mx, c), last = c)
      }
      // b < s.b: stale bucket, dropped (ordering contract)
    }
    st.update(s)
    out.iterator
  }
}

object M4Processor {
  /** Per-key state: the open bucket's M4 accumulator. */
  case class St(b: Long, n: Long, mn: Long, mx: Long, first: Long, last: Long)

  /** Rows: (key, ts_us, seq, cents) → one row per COMPLETED
    * (key, bucket): (key, b, n, min_c, max_c, first_c, last_c) — the
    * batch `ts_downsample_m4` columns.
    */
  def apply(
      spark: SparkSession,
      rows: Dataset[(String, Long, Long, Long)]): Dataset[(String, Long, Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    SeriesStatsProcessor.configure(spark)
    rows.groupByKey(_._1)
      .transformWithState(new M4Processor, TimeMode.None(), OutputMode.Update())
  }
}
