package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of the per-GROUP layer of `quality_t_closeness` —
  * the third leg of the streaming governance family next to
  * [[KAnonymityProcessor]] (ksize, ldiv) and [[PiiProcessor]]: keyed
  * by the quasi-identifier tuple, a running sensitive-bin→count map
  * (MapState) plus the group size (ValueState); each micro-batch
  * re-derives the group's ordered-distance EMD against a FROZEN global
  * distribution. The global cumulative bin table is the frozen
  * reference (the [[ConformalProcessor]] split: a batch job over the
  * published release freezes (sb → CumQ, N, m); the stream monitors
  * how far each quasi-group's conditional distribution drifts from it)
  * — it rides in the processor as immutable config, NOT per-row
  * payload, because EMD needs every global bin including the ones the
  * group has never seen (the flat-segment |CumP − CumQ| terms).
  *
  * Exact under any micro-batch split: bin counts only grow, the EMD is
  * recomputed from the full current state each emit, and every step is
  * the batch query's own integer math — cumulative ×10⁶ truncating
  * rationals (all operands non-negative, so Java `/` ≡ DIV), absolute
  * diffs summed as longs, one shared `/(m−1)`. State per group is
  * bounded by the global bin domain m, never by the row count.
  *
  * Rows: (quasiKey, sb) → one running (quasiKey, ksize, emd_e6) row
  * per touched group per micro-batch.
  */
class TClosenessProcessor(globalCum: Array[(Long, Long)], nTot: Long, m: Long)
    extends StatefulProcessor[String, (String, Long), (String, Long, Long)] {
  require(m >= 2, s"t-closeness EMD needs >= 2 global bins, got $m")
  require(nTot >= 1, "frozen global distribution is empty")

  @transient private var bins: MapState[Long, Long] = _
  @transient private var n: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    bins = getHandle.getMapState[Long, Long](
      "binCounts", Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
    n = getHandle.getValueState[Long](
      "groupSize", Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(
      key: String,
      rows: Iterator[(String, Long)],
      timerValues: TimerValues): Iterator[(String, Long, Long)] = {
    var k = if (n.exists()) n.get() else 0L
    rows.foreach { case (_, sb) =>
      val c = if (bins.containsKey(sb)) bins.getValue(sb) else 0L
      bins.updateValue(sb, c + 1)
      k += 1
    }
    n.update(k)
    if (k == 0L) Iterator.empty
    else {
      // walk the FROZEN global spine in sb order, accumulating the
      // group's cumulative count — absent bins still contribute
      var cumg = 0L
      var d = 0L
      var i = 0
      while (i < globalCum.length) {
        val (sb, cumN) = globalCum(i)
        if (bins.containsKey(sb)) cumg += bins.getValue(sb)
        d += math.abs(cumg * 1000000L / k - cumN * 1000000L / nTot)
        i += 1
      }
      Iterator((key, k, d / (m - 1)))
    }
  }
}

object TClosenessProcessor {

  /** Rows: (quasiKey, sensitiveBin). `globalCum` is the frozen global
    * cumulative distribution [(sb, CumQ(sb))] SORTED by sb, `nTot` its
    * total mass, `m` its bin count — freeze them from the published
    * batch release (`Quality.tClosenessGroups`' gl/tot aggregates).
    */
  def apply(
      spark: SparkSession,
      rows: Dataset[(String, Long)],
      globalCum: Array[(Long, Long)],
      nTot: Long,
      m: Long): Dataset[(String, Long, Long)] = {
    import spark.implicits._
    val sorted = globalCum.sortBy(_._1)
    SeriesStatsProcessor.configure(spark)
    rows.groupByKey(_._1)
      .transformWithState(new TClosenessProcessor(sorted, nTot, m),
        TimeMode.None(), OutputMode.Update())
  }
}
