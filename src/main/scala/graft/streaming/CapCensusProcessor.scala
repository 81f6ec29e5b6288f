package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Streaming twin of the `dedup_cap_coverage` cap-bite census
  * ([[graft.ops.Scale.capCensus]]) — the no-silent-caps diagnostic
  * running WITH ingestion instead of behind the nightly audit: keyed by
  * cap SITE, a bucket→count map (MapState, the KAnonymity/TCloseness
  * state class) over the site's candidate-bucket key stream. Bucket
  * counts only grow, and the census (buckets total/over-cap, pair mass
  * total/admitted) is a pure function of the FINAL counts, so the last
  * emitted row per site is bit-identical to the batch census over the
  * same rows under ANY stream split — no frozen reference needed. The
  * cap itself is processor CONFIG (constructor map, the
  * TClosenessProcessor frozen-config precedent): it only shapes the
  * derived over-cap/admitted columns at emit, never the state. State is
  * bounded by bucket cardinality per site (the same key the batch miner
  * shuffles on), never by row count.
  *
  * Emits (site, buckets_total, buckets_dropped, pair_mass_total,
  * pair_mass_admitted) — the capCensus column contract.
  */
class CapCensusProcessor(caps: Map[String, Long])
    extends StatefulProcessor[String, (String, String), (String, Long, Long, Long, Long)] {

  @transient private var counts: MapState[String, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    counts = getHandle.getMapState[String, Long](
      "bucketCounts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[(String, String)],
      timerValues: TimerValues): Iterator[(String, Long, Long, Long, Long)] = {
    rows.foreach { case (_, b) =>
      val cur = if (counts.containsKey(b)) counts.getValue(b) else 0L
      counts.updateValue(b, cur + 1)
    }
    val cap = caps.getOrElse(key, Long.MaxValue)
    var bt = 0L; var bd = 0L; var pt = 0L; var pa = 0L
    val it = counts.iterator()
    while (it.hasNext) {
      val n = it.next()._2
      bt += 1
      val pairs = n * (n - 1) / 2
      pt += pairs
      if (n > cap) bd += 1 else pa += pairs
    }
    if (bt == 0L) Iterator.empty
    else Iterator((key, bt, bd, pt, pa))
  }
}

object CapCensusProcessor {

  /** Rows: (site, bucketKey) → after each batch one running census row
    * per touched site; the final row per site equals
    * [[graft.ops.Scale.capCensus]] over the same rows.
    */
  def apply(
      spark: SparkSession,
      rows: Dataset[(String, String)],
      caps: Map[String, Long]): Dataset[(String, Long, Long, Long, Long)] = {
    import spark.implicits._
    SeriesStatsProcessor.configure(spark)
    rows.groupByKey(_._1)
      .transformWithState(new CapCensusProcessor(caps), TimeMode.None(), OutputMode.Update())
  }
}
