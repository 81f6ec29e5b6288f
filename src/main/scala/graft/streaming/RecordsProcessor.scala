package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of ts_record_stats: per-series running-extreme record
  * counting in seven longs of state (n, current max/min, record-high/low
  * counts, last record hours). A point is a record high iff STRICTLY
  * above the prior running max — and the first observation counts as
  * both kinds of record, exactly the batch window's empty-preceding-
  * frame NULL convention — so the fold is bit-identical to the batch
  * prefix-extreme windows, not merely convergent. Record counting is
  * the cheapest drift detector there is (state never grows, no
  * thresholds), which is why it belongs on the live path: the batch
  * query is the nightly audit, this is the per-event alarm.
  * Fold-twin ordering precondition: per-key rows arrive in bucket (h)
  * ascending order across batches; intra-batch arrivals are sorted
  * here.
  */
class RecordsProcessor
    extends StatefulProcessor[String, (String, Long, Long), (String, Long, Long, Long, Long, Long)] {

  @transient private var st: ValueState[(Long, Long, Long, Long, Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Long, Long, Long, Long, Long, Long, Long)](
      "records", Encoders.product[(Long, Long, Long, Long, Long, Long, Long)], TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[(String, Long, Long)],
      timerValues: TimerValues): Iterator[(String, Long, Long, Long, Long, Long)] = {
    var (n, mx, mn, nHi, nLo, hHi, hLo) =
      if (st.exists()) st.get() else (0L, 0L, 0L, 0L, 0L, 0L, 0L)
    rows.toArray.sortBy(_._2).foreach { case (_, h, c) =>
      if (n == 0) { mx = c; mn = c; nHi = 1; nLo = 1; hHi = h; hLo = h }
      else {
        if (c > mx) { mx = c; nHi += 1; hHi = h }
        if (c < mn) { mn = c; nLo += 1; hLo = h }
      }
      n += 1
    }
    st.update((n, mx, mn, nHi, nLo, hHi, hLo))
    if (n == 0) Iterator.empty
    else Iterator((key, n, nHi, nLo, hHi, hLo))
  }
}

object RecordsProcessor {

  /** Rows: (seriesKey, bucket, value) with per-key bucket ascending
    * across batches → after each batch one running
    * (key, n, n_rec_hi, n_rec_lo, h_last_hi, h_last_lo) row.
    */
  def apply(
      spark: SparkSession,
      rows: Dataset[(String, Long, Long)]): Dataset[(String, Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    SeriesStatsProcessor.configure(spark)
    rows.groupByKey(_._1)
      .transformWithState(new RecordsProcessor, TimeMode.None(), OutputMode.Update())
  }
}
