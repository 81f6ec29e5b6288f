package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of the batch `ts_runs_test` (Wald–Wolfowitz) fold
  * against a FROZEN per-key reference level: the batch query
  * dichotomizes around the trailing-window median — a non-causal
  * statistic no single pass can reproduce — so the production split is
  * the standard one: a batch job freezes the reference (median,
  * baseline, SLO target), every streamed row carries it, and this
  * processor maintains the runs state against it in four longs
  * (n₁, n₂, runs, previous sign). Given the same reference the fold is
  * bit-identical to the batch lag-window: equal-to-reference points
  * are skipped, runs = sign-changes + 1, and the z² statistic is the
  * same cross-multiplied integer rational (×10⁴) with the nullif
  * denominator surfaced as None.
  *
  * Emits one running row per key per micro-batch:
  * (key, n1, n2, runs, n, mu_e4, z2_e4, random_at_5pct).
  */
class RunsTestProcessor
    extends StatefulProcessor[String, (String, Long, Long, Long), (String, Long, Long, Long, Long, Long, Option[Long], Option[Boolean])] {

  @transient private var st: ValueState[(Long, Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Long, Long, Long, Long)](
      "runs", Encoders.product[(Long, Long, Long, Long)], TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[(String, Long, Long, Long)],
      timerValues: TimerValues): Iterator[(String, Long, Long, Long, Long, Long, Option[Long], Option[Boolean])] = {
    // prev sign: -1 = no prior point (the batch lag NULL)
    var (n1, n2, runs, prev) =
      if (st.exists()) st.get() else (0L, 0L, 0L, -1L)
    rows.toArray.sortBy(_._2).foreach { case (_, _, c, m) =>
      if (c != m) {
        val sgn = if (c > m) 1L else 0L
        if (sgn == 1L) n1 += 1 else n2 += 1
        if (prev == -1L) runs = 1L
        else if (sgn != prev) runs += 1
        prev = sgn
      }
    }
    st.update((n1, n2, runs, prev))
    val n = n1 + n2
    if (n == 0) Iterator.empty
    else {
      val muE4 = 2 * n1 * n2 * 10000 / n + 10000
      val den = 2 * n1 * n2 * (2 * n1 * n2 - n)
      val num = (runs - 1) * n - 2 * n1 * n2
      val z2 = if (den == 0) None else Some(num * num * (n - 1) * 10000 / den)
      Iterator((key, n1, n2, runs, n, muE4, z2, z2.map(_ <= 38416L)))
    }
  }
}

object RunsTestProcessor {

  /** Rows: (seriesKey, bucket, value, frozenReference) with per-key
    * bucket ascending across batches → after each batch one running
    * (key, n1, n2, runs, n, mu_e4, z2_e4, random_at_5pct) row.
    */
  def apply(
      spark: SparkSession,
      rows: Dataset[(String, Long, Long, Long)]): Dataset[(String, Long, Long, Long, Long, Long, Option[Long], Option[Boolean])] = {
    import spark.implicits._
    SeriesStatsProcessor.configure(spark)
    rows.groupByKey(_._1)
      .transformWithState(new RunsTestProcessor, TimeMode.None(), OutputMode.Update())
  }
}
