package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** WATERMARKED variant of [[SloBurnProcessor]] — the same multi-window
  * burn-rate ring, but with an EXPLICIT late-data gate: points whose
  * event time has fallen behind the stream's watermark are DROPPED
  * instead of folded into a fresh bucket position. The unwatermarked
  * twin documents its ordering contract as "exactly the staleness a
  * watermark would have dropped" — this processor enforces that
  * contract, so an hour bucket can never be resurrected after its
  * trailing windows have shipped downstream.
  *
  * The gate reads `timerValues.getCurrentWatermarkInMs()` (TimeMode
  * EventTime; the companion wires `withWatermark` upstream) and filters
  * the micro-batch BEFORE the shared ring fold
  * ([[SloBurnProcessor.step]]) — explicit rather than relying on
  * engine-side row filtering, because the house tuple-dataset wiring
  * drops the event-time column after `withWatermark` (the watermark
  * VALUE survives in the plan; row filtering would not). Everything
  * admitted is bit-exact with the unwatermarked twin on the same
  * admitted subset, trivially: the fold is the same code.
  *
  * Scale: state unchanged (a ≤ `windowHours` ring per key); the gate is
  * a per-row comparison. The watermark delay chooses the lateness bound
  * the ring previously absorbed implicitly.
  */
class SloBurnLateProcessor(
    budgetBp: Long = 2000L,
    windowHours: Int = 6,
    pageFastBp: Long = 20000L,
    pageSlowBp: Long = 15000L,
    ticketBp: Long = 10000L)
    extends StatefulProcessor[Long, (Long, Long, Long),
      (Long, Long, Long, Long, Long, Long, Boolean, Boolean)] {

  require(budgetBp > 0 && 100000000L % budgetBp == 0,
    "budgetBp must divide 10^8 so the burn multiplier is exact")
  require(windowHours >= 1)
  private val mult = 100000000L / budgetBp

  @transient private var st: ValueState[SloBurnProcessor.Buckets] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[SloBurnProcessor.Buckets](
      "slo", Encoders.product[SloBurnProcessor.Buckets], TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, Long, Long)],
      timerValues: TimerValues): Iterator[(Long, Long, Long, Long, Long, Long, Boolean, Boolean)] = {
    val wmUs = timerValues.getCurrentWatermarkInMs() * 1000L
    val pts = rows.toArray.filter(_._2 >= wmUs)
    if (pts.isEmpty) return Iterator.empty
    val buf0 = if (st.exists()) st.get().bs.toVector else Vector.empty[(Long, Long, Long)]
    val (buf, out) = SloBurnProcessor.step(key, buf0, pts, windowHours, mult,
      pageFastBp, pageSlowBp, ticketBp)
    st.update(SloBurnProcessor.Buckets(buf.takeRight(windowHours)))
    out.iterator
  }
}

object SloBurnLateProcessor {
  /** Rows: (key, ts_us, err 0/1) → per affected (key, hour) each
    * micro-batch, minus anything older than the watermark (`delay`
    * behind the max event time seen). Output columns match
    * [[SloBurnProcessor]] exactly.
    */
  def apply(
      spark: SparkSession,
      rows: Dataset[(Long, Long, Long)],
      budgetBp: Long = 2000L,
      windowHours: Int = 6,
      delay: String = "2 hours"): Dataset[(Long, Long, Long, Long, Long, Long, Boolean, Boolean)] = {
    import spark.implicits._
    SeriesStatsProcessor.configure(spark)
    val wm = rows.toDF("k", "ts_us", "err")
      .withColumn("eventTime", timestamp_micros(col("ts_us")))
      .withWatermark("eventTime", delay)
      .select(col("k"), col("ts_us"), col("err")).as[(Long, Long, Long)]
    wm.groupByKey(_._1)
      .transformWithState(new SloBurnLateProcessor(budgetBp, windowHours),
        TimeMode.EventTime(), OutputMode.Update())
  }
}
