package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of the per-GROUP layer of `quality_k_anonymity` —
  * governance that keeps up with ingestion instead of waiting for the
  * nightly batch audit: keyed by the quasi-identifier tuple, a running
  * group size (ValueState) plus a value→count map (MapState) whose KEY
  * CARDINALITY is the group's l-diversity. Both are exact after any
  * stream prefix: counts only grow, and a value's first arrival is the
  * only event that changes ldiv, so the emitted (ksize, ldiv) per group
  * is bit-identical to the batch aggregation over the same prefix.
  * State is bounded by the quasi domain × the value-band width (the
  * batch query's vb band holds ≤ 1000 distinct exact values), never by
  * the row count. The k-threshold exposure report is a bounded
  * aggregation OVER the emitted group rows (groups ≪ rows) — the
  * StreamingSpec twin runs the identical threshold SQL on the final
  * per-group rows and matches quality_k_anonymity exactly.
  */
class KAnonymityProcessor
    extends StatefulProcessor[String, (String, Long), (String, Long, Long)] {

  @transient private var vals: MapState[Long, Long] = _
  @transient private var n: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    vals = getHandle.getMapState[Long, Long](
      "valueCounts", Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
    n = getHandle.getValueState[Long](
      "groupSize", Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(
      key: String,
      rows: Iterator[(String, Long)],
      timerValues: TimerValues): Iterator[(String, Long, Long)] = {
    var k = if (n.exists()) n.get() else 0L
    rows.foreach { case (_, c) =>
      val cc = if (vals.containsKey(c)) vals.getValue(c) else 0L
      vals.updateValue(c, cc + 1)
      k += 1
    }
    n.update(k)
    if (k == 0L) Iterator.empty
    else Iterator((key, k, vals.keys().size.toLong))
  }
}

object KAnonymityProcessor {

  /** Rows: (quasiKey, exactValue) → after each batch one running
    * (quasiKey, ksize, ldiv) row per touched group.
    */
  def apply(
      spark: SparkSession,
      rows: Dataset[(String, Long)]): Dataset[(String, Long, Long)] = {
    import spark.implicits._
    SeriesStatsProcessor.configure(spark)
    rows.groupByKey(_._1)
      .transformWithState(new KAnonymityProcessor, TimeMode.None(), OutputMode.Update())
  }
}
