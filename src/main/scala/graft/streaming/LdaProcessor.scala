package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of q_lda_classifier's TRAINING half: per-key
  * one-pass per-class LDA moments — twelve longs of state (n, Σx1,
  * Σx2, Σx1², Σx1x2, Σx2² for each class) — re-solved after every
  * micro-batch with the IDENTICAL integer arithmetic
  * ([[graft.ops.Fit.ldaSolveLong]]). The sums are associative and
  * commutative, so the final model equals the batch fit under ANY
  * input split. Emits nothing until both classes have been seen
  * (the solve needs both means). The batch query's confusion-matrix
  * half needs a second pass over the data and stays batch; an online
  * scorer would subscribe to this model stream.
  */
class LdaProcessor
    extends StatefulProcessor[String, (String, Long, Long, Long),
      (String, Long, Long, Long, Long, Boolean, Long)] {

  @transient private var st: ValueState[LdaProcessor.S] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[LdaProcessor.S](
      "lda_moments", Encoders.product[LdaProcessor.S], TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[(String, Long, Long, Long)],
      timerValues: TimerValues): Iterator[(String, Long, Long, Long, Long, Boolean, Long)] = {
    var s = if (st.exists()) st.get()
      else LdaProcessor.S(0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L)
    rows.foreach { case (_, y, x1, x2) =>
      if (y == 0L)
        s = s.copy(n0 = s.n0 + 1, s10 = s.s10 + x1, s20 = s.s20 + x2,
          s110 = s.s110 + x1 * x1, s120 = s.s120 + x1 * x2, s220 = s.s220 + x2 * x2)
      else
        s = s.copy(n1 = s.n1 + 1, s11 = s.s11 + x1, s21 = s.s21 + x2,
          s111 = s.s111 + x1 * x1, s121 = s.s121 + x1 * x2, s221 = s.s221 + x2 * x2)
    }
    st.update(s)
    if (s.n0 == 0 || s.n1 == 0) Iterator.empty
    else {
      val (w1, w2, thr, flip, det) = graft.ops.Fit.ldaSolveLong(
        s.n0, s.s10, s.s20, s.s110, s.s120, s.s220,
        s.n1, s.s11, s.s21, s.s111, s.s121, s.s221)
      Iterator((key, s.n0 + s.n1, w1, w2, thr, flip, det))
    }
  }
}

object LdaProcessor {
  /** Per-class one-pass moments. */
  final case class S(n0: Long, s10: Long, s20: Long, s110: Long, s120: Long,
    s220: Long, n1: Long, s11: Long, s21: Long, s111: Long, s121: Long, s221: Long)

  /** Rows: (key, y ∈ {0,1}, x1, x2) in any order → after each batch one
    * running (key, n, w1_milli, w2_milli, thr, flip, det_q) model row
    * per touched key (once both classes are present).
    */
  def apply(
      spark: SparkSession,
      rows: Dataset[(String, Long, Long, Long)]): Dataset[(String, Long, Long, Long, Long, Boolean, Long)] = {
    import spark.implicits._
    SeriesStatsProcessor.configure(spark)
    rows.groupByKey(_._1)
      .transformWithState(new LdaProcessor, TimeMode.None(), OutputMode.Update())
  }
}
