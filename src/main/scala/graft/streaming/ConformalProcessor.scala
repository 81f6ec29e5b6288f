package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of the batch `quality_conformal_bounds` TEST side
  * against FROZEN calibration statistics: the calibration median and
  * the 90% conformal quantile q̂ are rank statistics no single pass can
  * reproduce (the [[ExtremalProcessor]]/[[RunsTestProcessor]]
  * frozen-reference split), so a batch job over the calibration split
  * freezes (med, q̂), every streamed test row carries them, and this
  * processor maintains the realized-coverage census in two longs
  * (n_test, covered) — the production shape of a conformal gate:
  * recalibrate offline, monitor the ≥90% marginal-coverage guarantee
  * online. Both counters are associative sums and the coverage is the
  * batch column's exact truncating rational (`covered·10⁴ DIV n_test`,
  * both non-negative, so Java `/` ≡ DIV), so the final row after ANY
  * micro-batch split is bit-identical to the batch query's.
  *
  * Rows: (key, cents, frozenMed, frozenQhat) → one running
  * (key, n_test, covered, coverage_bp) row per key per micro-batch.
  */
class ConformalProcessor
    extends StatefulProcessor[String, (String, Long, Long, Long), (String, Long, Long, Long)] {

  @transient private var st: ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Long, Long)](
      "conformal", Encoders.product[(Long, Long)], TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[(String, Long, Long, Long)],
      timerValues: TimerValues): Iterator[(String, Long, Long, Long)] = {
    var (n, cov) = if (st.exists()) st.get() else (0L, 0L)
    rows.foreach { case (_, c, med, qhat) =>
      n += 1L
      if (Math.abs(c - med) <= qhat) cov += 1L
    }
    st.update((n, cov))
    if (n == 0L) Iterator.empty
    else Iterator((key, n, cov, cov * 10000L / n))
  }
}

object ConformalProcessor {

  /** Rows: (seriesKey, cents, frozenMedian, frozenQhat) → after each
    * batch one running (key, n_test, covered, coverage_bp) row.
    */
  def apply(
      spark: SparkSession,
      rows: Dataset[(String, Long, Long, Long)]): Dataset[(String, Long, Long, Long)] = {
    import spark.implicits._
    SeriesStatsProcessor.configure(spark)
    rows.groupByKey(_._1)
      .transformWithState(new ConformalProcessor, TimeMode.None(), OutputMode.Update())
  }
}
