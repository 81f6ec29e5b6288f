package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of the batch `ts_extremal_index` fold against a
  * FROZEN per-key threshold: the batch threshold is a rank statistic
  * (the empirical 90% order statistic) no single pass can reproduce, so
  * — exactly like [[RunsTestProcessor]]'s frozen median — a batch job
  * freezes u, every streamed row carries it, and this processor
  * maintains the exceedance-clustering state in five longs (last
  * exceedance index, n_exceed, n_clusters, ΣT, ΣT²). Given the same u
  * and the same per-key ascending index the fold is bit-identical to
  * the batch lag window: a new cluster opens when the index gap to the
  * previous exceedance exceeds the run length 2 (or there is none), and
  * both θ estimators are the same truncating-integer rationals.
  *
  * Emits one running row per key per micro-batch:
  * (key, n_exceed, n_clusters, theta_runs_bp, theta_fs_bp).
  */
class ExtremalProcessor
    extends StatefulProcessor[String, (String, Long, Long, Long), (String, Long, Long, Long, Long)] {

  @transient private var st: ValueState[(Long, Long, Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Long, Long, Long, Long, Long)](
      "extremal", Encoders.product[(Long, Long, Long, Long, Long)], TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[(String, Long, Long, Long)],
      timerValues: TimerValues): Iterator[(String, Long, Long, Long, Long)] = {
    // lastIdx = -1 -> no exceedance seen yet (the batch lag NULL)
    var (lastIdx, nEx, nCl, sT, sT2) =
      if (st.exists()) st.get() else (-1L, 0L, 0L, 0L, 0L)
    rows.toArray.sortBy(_._2).foreach { case (_, idx, c, u) =>
      if (c > u) {
        nEx += 1
        if (lastIdx < 0L) nCl += 1
        else {
          val gap = idx - lastIdx
          if (gap > 2L) nCl += 1
          sT = Math.addExact(sT, gap)
          sT2 = Math.addExact(sT2, Math.multiplyExact(gap, gap))
        }
        lastIdx = idx
      }
    }
    st.update((lastIdx, nEx, nCl, sT, sT2))
    if (nEx == 0L) Iterator.empty
    else {
      val thetaRuns = 10000L * nCl / nEx
      val thetaFs =
        if (nEx > 1L && sT2 > 0L)
          Math.min(10000L, 20000L * sT * sT / ((nEx - 1L) * sT2))
        else 10000L
      Iterator((key, nEx, nCl, thetaRuns, thetaFs))
    }
  }
}

object ExtremalProcessor {

  /** Rows: (seriesKey, timeOrderIndex, value, frozenThreshold) with
    * per-key index ascending across batches → after each batch one
    * running (key, n_exceed, n_clusters, theta_runs_bp, theta_fs_bp)
    * row.
    */
  def apply(
      spark: SparkSession,
      rows: Dataset[(String, Long, Long, Long)]): Dataset[(String, Long, Long, Long, Long)] = {
    import spark.implicits._
    SeriesStatsProcessor.configure(spark)
    rows.groupByKey(_._1)
      .transformWithState(new ExtremalProcessor, TimeMode.None(), OutputMode.Update())
  }
}
