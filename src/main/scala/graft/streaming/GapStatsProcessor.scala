package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of ts_burstiness: per-series inter-event gap moments
  * in four longs of state (last timestamp, n, Σg, Σg²), emitting the
  * running (n, μ, σ, B·10⁴) after every micro-batch. Exactness rests on
  * the algebraic identity Σ(g−μ)² = Σg² − 2μΣg + nμ², which holds for
  * ANY constant μ — including the batch side's truncating integer mean
  * — so the single-pass moments reproduce the two-pass centered sum
  * bit-for-bit, then the same isqrt-correct-by-squaring σ and e4 ratio.
  * Fold-twin ordering precondition: per-key rows arrive in (ts, id)
  * order across batches (intra-batch arrivals are sorted here).
  * Degenerate σ+μ = 0 emits B = 0 where the batch query emits NULL —
  * the one deliberate divergence, documented for the parity test.
  */
class GapStatsProcessor
    extends StatefulProcessor[String, (String, Long, Long), (String, Long, Long, Long, Long)] {

  @transient private var st: ValueState[(Long, Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Long, Long, Long, Long)](
      "gaps", Encoders.product[(Long, Long, Long, Long)], TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[(String, Long, Long)],
      timerValues: TimerValues): Iterator[(String, Long, Long, Long, Long)] = {
    var (last, n, sg, sgg) =
      if (st.exists()) st.get() else (Long.MinValue, 0L, 0L, 0L)
    rows.toArray.sortBy(r => (r._2, r._3)).foreach { case (_, ts, _) =>
      if (last != Long.MinValue) {
        val g = (ts - last) / 1000000L // whole seconds, ordered => non-negative
        n += 1; sg += g; sgg += g * g
      }
      last = ts
    }
    st.update((last, n, sg, sgg))
    if (n == 0) Iterator.empty
    else {
      val mu = sg / n
      val v = (sgg - 2 * mu * sg + n * mu * mu) / n
      val sigma = GapStatsProcessor.isqrt(v)
      val b = if (sigma + mu != 0) (sigma - mu) * 10000 / (sigma + mu) else 0L
      Iterator((key, n, mu, sigma, b))
    }
  }
}

object GapStatsProcessor {

  /** Exact integer floor-sqrt: float seed corrected by SQUARING (the
    * temperatureAlloc discipline — never trust the float at perfect-
    * square boundaries).
    */
  def isqrt(v: Long): Long = {
    require(v >= 0, "isqrt of negative")
    var k = math.sqrt(v.toDouble).toLong
    while (k > 0 && k * k > v) k -= 1
    while ((k + 1) * (k + 1) <= v) k += 1
    k
  }

  /** Rows: (seriesKey, ts_us, rowId) with per-key (ts, id) ascending
    * across batches → after each batch one running
    * (key, n_gaps, mean_gap_s, sigma_gap_s, burstiness_e4) row.
    */
  def apply(
      spark: SparkSession,
      rows: Dataset[(String, Long, Long)]): Dataset[(String, Long, Long, Long, Long)] = {
    import spark.implicits._
    SeriesStatsProcessor.configure(spark)
    rows.groupByKey(_._1)
      .transformWithState(new GapStatsProcessor, TimeMode.None(), OutputMode.Update())
  }
}
