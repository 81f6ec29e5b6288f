package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of the batch `ts_ewma` operator
  * (ops/Series.ewmaLast): per-key EWMA level maintained across
  * micro-batches via transformWithState, s_1 = x_1,
  * s_i = (1-α)·s_{i-1} + α·x_i.
  *
  * Parity contract with the batch fold: EXACT — bit-identical doubles —
  * as long as each key's points arrive in (ts, id) order ACROSS
  * micro-batches (the tail-a-log / kafka-per-key-ordered case). Points
  * within one micro-batch are sorted by (ts, id) before folding, so
  * intra-batch arrival order never matters; a point arriving in a LATER
  * batch than a newer one (cross-batch disorder) is folded late — the
  * same caveat as any order-sensitive streaming accumulator. State is
  * O(1) per key: (n, level per α).
  */
class EwmaProcessor(alphas: Seq[Double])
    extends StatefulProcessor[Long, (Long, Long, Long, Double), (Long, Long, Seq[Double])] {

  require(alphas.nonEmpty && alphas.forall(a => a > 0 && a <= 1))

  @transient private var st: ValueState[(Long, Seq[Double])] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Long, Seq[Double])](
      "ewma", Encoders.product[(Long, Seq[Double])], TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, Long, Long, Double)],
      timerValues: TimerValues): Iterator[(Long, Long, Seq[Double])] = {
    // (key, ts, id, v) — sort the micro-batch's points like the batch
    // operator's array_sort so intra-batch arrival order is irrelevant
    val pts = rows.toArray.sortBy(r => (r._2, r._3))
    if (pts.isEmpty) Iterator.empty
    else {
      var (n, levels) = if (st.exists()) st.get() else (0L, null: Seq[Double])
      pts.foreach { p =>
        val x = p._4
        levels =
          if (n == 0L) alphas.map(_ => x) // s_1 = x_1, every alpha
          else levels.zip(alphas).map { case (s, a) => s * (1.0 - a) + x * a }
        n += 1
      }
      st.update((n, levels))
      Iterator.single((key, n, levels))
    }
  }
}

object EwmaProcessor {
  /** Rows: (key, ts, id, v) → per touched key each micro-batch:
    * (key, n_points, levels aligned with `alphas`).
    */
  def apply(
      spark: SparkSession,
      rows: Dataset[(Long, Long, Long, Double)],
      alphas: Seq[Double]): Dataset[(Long, Long, Seq[Double])] = {
    import spark.implicits._
    SeriesStatsProcessor.configure(spark)
    rows.groupByKey(_._1)
      .transformWithState(new EwmaProcessor(alphas), TimeMode.None(), OutputMode.Update())
  }
}
