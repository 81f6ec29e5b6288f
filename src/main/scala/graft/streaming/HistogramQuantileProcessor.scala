package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of the batch `ts_histogram_quantile` operator: the
  * PromQL histogram_quantile over bucketed COUNTERS, maintained per
  * key in ELEVEN longs of state — the total plus the ten cumulative
  * `le` bucket counts. Bucket counts are pure sums, so the processor
  * is fully order-INSENSITIVE, and each micro-batch emits the three
  * (φ=0.50/0.90/0.99) quantiles computed by the IDENTICAL integer
  * bracket-and-interpolate: ceiling target rank
  * (total·φ + 9999) DIV 10⁴, the first bucket whose cumulative count
  * reaches it, linear interpolation inside the bucket in truncating
  * integer e4 — and the +Inf bucket returns the highest finite bound,
  * per promql. Every emission equals the batch query over the rows
  * seen so far, bit-for-bit.
  *
  * This is the monitoring shape that makes bucketed histograms THE
  * 100-TB quantile answer: the state is mergeable counts, never raw
  * samples.
  */
class HistogramQuantileProcessor
    extends StatefulProcessor[String, (String, Long), (String, Long, Long, Long)] {

  import HistogramQuantileProcessor.{Les, Phis}

  @transient private var st: ValueState[HistogramQuantileProcessor.S] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[HistogramQuantileProcessor.S](
      "hq", Encoders.product[HistogramQuantileProcessor.S], TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[(String, Long)],
      timerValues: TimerValues): Iterator[(String, Long, Long, Long)] = {
    val prev = if (st.exists()) st.get()
      else HistogramQuantileProcessor.S(0L, Seq.fill(Les.length)(0L))
    var total = prev.total
    val cum = prev.cum.toArray
    rows.foreach { case (_, cents) =>
      total += 1L
      var i = 0
      while (i < Les.length) { if (cents <= Les(i)) cum(i) += 1L; i += 1 }
    }
    st.update(HistogramQuantileProcessor.S(total, cum.toSeq))
    if (total == 0) Iterator.empty
    else Phis.iterator.map { phi =>
      val target = (total * phi + 9999L) / 10000L
      // boundaries ascending, +Inf last (cum = total); exactly one
      // bucket has prevCum < target <= cum
      var i = 0
      var prevLe = 0L; var prevCum = 0L
      var q = 0L
      var done = false
      while (!done) {
        val (le, c) =
          if (i < Les.length) (Les(i), cum(i)) else (Long.MaxValue, total)
        if (c >= target && prevCum < target) {
          q = if (le == Long.MaxValue) prevLe * 100L
            else prevLe * 100L +
              (le - prevLe) * 100L * (target - prevCum) / (c - prevCum)
          done = true
        } else { prevLe = le; prevCum = c; i += 1 }
      }
      (key, phi, total, q)
    }
  }
}

object HistogramQuantileProcessor {
  /** The batch query's fixed cent thresholds and φ grid. */
  val Les: Array[Long] = (1 to 10).map(_ * 1000L).toArray
  val Phis: Array[Long] = Array(5000L, 9000L, 9900L)

  /** Total + cumulative per-bucket counts (parallel to [[Les]]). */
  final case class S(total: Long, cum: Seq[Long])

  /** Rows: (key, cents) in ANY order → per touched key each
    * micro-batch: (key, phi_bp, total, q_e4) × 3 — the batch query's
    * exact output columns.
    */
  def apply(
      spark: SparkSession,
      rows: Dataset[(String, Long)]): Dataset[(String, Long, Long, Long)] = {
    import spark.implicits._
    SeriesStatsProcessor.configure(spark)
    rows.groupByKey(_._1)
      .transformWithState(new HistogramQuantileProcessor, TimeMode.None(), OutputMode.Update())
  }
}
