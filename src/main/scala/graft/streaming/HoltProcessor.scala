package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of the batch `ts_holt_forecast` operator: per-key Holt
  * double-exponential smoothing (level + trend) maintained across
  * micro-batches via transformWithState, in the SAME integer basis-point
  * recurrence the batch fold runs (ops/Series.holtStepSql):
  * l₁ = y₁, b₁ = 0; l = (α·y + (1−α)·(l+b)) ÷ 10⁴,
  * b = (β·(l_new−l) + (1−β)·b) ÷ 10⁴ — JVM `Long` division truncates
  * toward zero exactly like Spark `DIV` and DuckDB `//`, so parity is
  * BIT-EXACT, not approximate. Same ordering contract as EwmaProcessor:
  * intra-batch points are sorted by (ts, id) before folding; cross-batch
  * order is the source's responsibility (per-key-ordered log/kafka).
  * State is three longs per key.
  */
class HoltProcessor(alphaBp: Long = 3000L, betaBp: Long = 1000L)
    extends StatefulProcessor[Long, (Long, Long, Long, Long), (Long, Long, Long, Long, Long)] {

  require(alphaBp >= 0 && alphaBp <= 10000 && betaBp >= 0 && betaBp <= 10000)

  @transient private var st: ValueState[(Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Long, Long, Long)](
      "holt", Encoders.product[(Long, Long, Long)], TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, Long, Long, Long)],
      timerValues: TimerValues): Iterator[(Long, Long, Long, Long, Long)] = {
    // (key, ts, id, y-cents) — sort like the batch fold's array_sort
    val pts = rows.toArray.sortBy(r => (r._2, r._3))
    if (pts.isEmpty) Iterator.empty
    else {
      var (n, l, b) = if (st.exists()) st.get() else (0L, 0L, 0L)
      pts.foreach { p =>
        val y = p._4
        if (n == 0L) { l = y; b = 0L }
        else {
          val ln = (alphaBp * y + (10000L - alphaBp) * (l + b)) / 10000L
          b = (betaBp * (ln - l) + (10000L - betaBp) * b) / 10000L
          l = ln
        }
        n += 1
      }
      st.update((n, l, b))
      Iterator.single((key, n, l, b, l + 3 * b))
    }
  }
}

object HoltProcessor {
  /** Rows: (key, ts, id, cents) → per touched key each micro-batch:
    * (key, n_points, level_c, trend_c, fc3_c) — the batch query's exact
    * output columns.
    */
  def apply(
      spark: SparkSession,
      rows: Dataset[(Long, Long, Long, Long)],
      alphaBp: Long = 3000L,
      betaBp: Long = 1000L): Dataset[(Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    SeriesStatsProcessor.configure(spark)
    rows.groupByKey(_._1)
      .transformWithState(new HoltProcessor(alphaBp, betaBp), TimeMode.None(), OutputMode.Update())
  }
}
