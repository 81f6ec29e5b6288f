package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of q_ridge_fit: per-key one-pass ridge-regression
  * sufficient statistics — nine longs of state (n, Σx1, Σx2, Σy, Σx1²,
  * Σx1x2, Σx2², Σx1y, Σx2y) — re-solved after every micro-batch with
  * the IDENTICAL integer arithmetic ([[graft.ops.Fit.ridgeSolveLong]];
  * Java / ≡ Spark DIV ≡ DuckDB //). The sums are associative and
  * commutative, so the final emission equals the batch query under ANY
  * split of the input — no frozen reference, no ordering precondition.
  * State is O(1) per key; checkpoint restart resumes the exact sums.
  */
class RidgeProcessor
    extends StatefulProcessor[String, (String, Long, Long, Long), (String, Long, Long, Long, Long, Long)] {

  @transient private var st: ValueState[(Long, Long, Long, Long, Long, Long, Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Long, Long, Long, Long, Long, Long, Long, Long, Long)](
      "moments",
      Encoders.product[(Long, Long, Long, Long, Long, Long, Long, Long, Long)],
      TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[(String, Long, Long, Long)],
      timerValues: TimerValues): Iterator[(String, Long, Long, Long, Long, Long)] = {
    var (n, s1, s2, sy, s11, s12, s22, s1y, s2y) =
      if (st.exists()) st.get() else (0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L)
    rows.foreach { case (_, x1, x2, y) =>
      n += 1; s1 += x1; s2 += x2; sy += y
      s11 += x1 * x1; s12 += x1 * x2; s22 += x2 * x2
      s1y += x1 * y; s2y += x2 * y
    }
    st.update((n, s1, s2, sy, s11, s12, s22, s1y, s2y))
    if (n == 0) Iterator.empty
    else {
      val (b1, b2, b0, det) = graft.ops.Fit.ridgeSolveLong(
        n, s1, s2, sy, s11, s12, s22, s1y, s2y)
      Iterator((key, n, b1, b2, b0, det))
    }
  }
}

object RidgeProcessor {

  /** Rows: (key, x1, x2, y) in any order → after each batch one running
    * (key, n, b1_milli, b2_milli, b0_milli, det_q) row per touched key.
    */
  def apply(
      spark: SparkSession,
      rows: Dataset[(String, Long, Long, Long)]): Dataset[(String, Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    SeriesStatsProcessor.configure(spark)
    rows.groupByKey(_._1)
      .transformWithState(new RidgeProcessor, TimeMode.None(), OutputMode.Update())
  }
}
