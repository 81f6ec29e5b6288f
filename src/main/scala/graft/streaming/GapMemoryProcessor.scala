package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of the batch `ts_gap_memory` operator: the
  * Goh–Barabási memory coefficient M — the lag-1 correlation between
  * consecutive inter-event gaps — maintained per key in NINE longs of
  * state: (lastTs, hasPrev, prevGap, n, Σx, Σy, Σx², Σy², Σxy), where
  * x = g_i and y = g_{i+1} over whole-SECOND gaps.
  *
  * Exactness: the batch query centers against the TRUNCATING means
  * mx = Σx DIV n, my = Σy DIV n and sums products of centered integers.
  * Those centered sums expand with NO division —
  * cov = Σxy − mx·Σy − my·Σx + n·mx·my,
  * vx = Σx² − 2·mx·Σx + n·mx², vy likewise — identities that hold for
  * ANY constant mx/my, so the single-pass raw sums reproduce the
  * two-pass batch sums bit-for-bit (the GapStats discipline, extended
  * to the cross moment). σx/σy use the same isqrt-correct-by-squaring,
  * and M·10⁴ = cov DIV ((σx·σy) DIV 10⁴) with the zero denominator
  * emitting None where the batch emits NULL.
  *
  * Fold-twin ordering precondition (same as GapStatsProcessor): per-key
  * rows arrive in (ts, id) order across batches; intra-batch arrivals
  * are sorted here.
  */
class GapMemoryProcessor
    extends StatefulProcessor[String, (String, Long, Long), (String, Long, Option[Long])] {

  @transient private var st: ValueState[(Long, Long, Long, Long, Long, Long, Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Long, Long, Long, Long, Long, Long, Long, Long, Long)](
      "gapmem",
      Encoders.product[(Long, Long, Long, Long, Long, Long, Long, Long, Long)],
      TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[(String, Long, Long)],
      timerValues: TimerValues): Iterator[(String, Long, Option[Long])] = {
    var (last, hasPrev, prevGap, n, sx, sy, sxx, syy, sxy) =
      if (st.exists()) st.get()
      else (Long.MinValue, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L)
    rows.toArray.sortBy(r => (r._2, r._3)).foreach { case (_, ts, _) =>
      if (last != Long.MinValue) {
        val g = (ts - last) / 1000000L // whole seconds, ordered => non-negative
        if (hasPrev == 1L) {
          n += 1
          sx += prevGap; sxx += prevGap * prevGap
          sy += g; syy += g * g
          sxy += prevGap * g
        }
        prevGap = g; hasPrev = 1L
      }
      last = ts
    }
    st.update((last, hasPrev, prevGap, n, sx, sy, sxx, syy, sxy))
    if (n == 0) Iterator.empty
    else {
      val mx = sx / n
      val my = sy / n
      val cov = sxy - mx * sy - my * sx + n * mx * my
      val vx = sxx - 2 * mx * sx + n * mx * mx
      val vy = syy - 2 * my * sy + n * my * my
      val den = (GapStatsProcessor.isqrt(vx) * GapStatsProcessor.isqrt(vy)) / 10000L
      Iterator((key, n, if (den == 0) None else Some(cov / den)))
    }
  }
}

object GapMemoryProcessor {

  /** Rows: (key, tsMicros, id) in per-key (ts, id) order → per touched
    * key each micro-batch: (key, n_pairs, memory_e4) — the batch
    * query's exact output columns.
    */
  def apply(
      spark: SparkSession,
      rows: Dataset[(String, Long, Long)]): Dataset[(String, Long, Option[Long])] = {
    import spark.implicits._
    SeriesStatsProcessor.configure(spark)
    rows.groupByKey(_._1)
      .transformWithState(new GapMemoryProcessor, TimeMode.None(), OutputMode.Update())
  }
}
