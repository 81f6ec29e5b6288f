package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of the batch `ts_adf_lite` Dickey–Fuller screen —
  * unlike the rank-threshold twins this one needs NO frozen reference:
  * the regression moments (m, Σx, ΣΔy, Σx², ΣxΔy, ΣΔy²) are plain
  * associative sums over (lag, delta) pairs, so per-key state is seven
  * longs (the six moments plus the carried last observation) and the
  * running statistic after any prefix of the stream is bit-identical
  * to the batch query over that prefix — including the ÷4096 / ÷10⁴
  * quantization stages, which are pure functions of the moments.
  *
  * Emits one running row per key per micro-batch:
  * (key, m, rho_e6 (None until the denominator is nonzero), t2_e4
  * (None while degenerate), unit_root_rejected_5pct).
  */
class AdfProcessor
    extends StatefulProcessor[String, (String, Long, Long), (String, Long, Option[Long], Option[Long], Option[Boolean])] {

  // (hasLast(0/1), lastY, m, sx, sy, sxx, sxy, syy)
  @transient private var st: ValueState[(Long, Long, Long, Long, Long, Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Long, Long, Long, Long, Long, Long, Long, Long)](
      "adf", Encoders.product[(Long, Long, Long, Long, Long, Long, Long, Long)],
      TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[(String, Long, Long)],
      timerValues: TimerValues): Iterator[(String, Long, Option[Long], Option[Long], Option[Boolean])] = {
    var (has, lastY, m, sx, sy, sxx, sxy, syy) =
      if (st.exists()) st.get() else (0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L)
    rows.toArray.sortBy(_._2).foreach { case (_, _, y) =>
      if (has == 1L) {
        val x = lastY
        val dy = y - x
        m += 1
        sx = Math.addExact(sx, x)
        sy = Math.addExact(sy, dy)
        sxx = Math.addExact(sxx, Math.multiplyExact(x, x))
        sxy = Math.addExact(sxy, Math.multiplyExact(x, dy))
        syy = Math.addExact(syy, Math.multiplyExact(dy, dy))
      }
      has = 1L
      lastY = y
    }
    st.update((has, lastY, m, sx, sy, sxx, sxy, syy))
    if (m == 0L) Iterator.empty
    else {
      val dxx = m * sxx - sx * sx
      val cxx = dxx / 4096
      val cxy = (m * sxy - sx * sy) / 4096
      val cyy = (m * syy - sy * sy) / 4096
      val rho = if (dxx == 0L) None else Some(1000000L * (m * sxy - sx * sy) / dxx)
      val denom = (cxx * cyy - cxy * cxy) / 10000
      val t2 = if (denom == 0L) None else Some((cxy * cxy / denom) * (m - 2L))
      val rejected = for (t <- t2; r <- rho) yield t > 81796L && r < 0L
      Iterator((key, m, rho, t2, rejected))
    }
  }
}

object AdfProcessor {

  /** Rows: (seriesKey, bucket, value) with per-key bucket ascending
    * across batches → after each batch one running
    * (key, m, rho_e6, t2_e4, unit_root_rejected_5pct) row.
    */
  def apply(
      spark: SparkSession,
      rows: Dataset[(String, Long, Long)]): Dataset[(String, Long, Option[Long], Option[Long], Option[Boolean])] = {
    import spark.implicits._
    SeriesStatsProcessor.configure(spark)
    rows.groupByKey(_._1)
      .transformWithState(new AdfProcessor, TimeMode.None(), OutputMode.Update())
  }
}
