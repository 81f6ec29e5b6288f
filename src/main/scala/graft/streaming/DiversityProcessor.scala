package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of `quality_diversity_index` — running composition
  * concentration per dimension, and the registry's first MapState
  * processor: per key (the dimension) a group→count map plus three
  * scalars (N, Σn(n−1), max n). The Simpson numerator updates
  * INCREMENTALLY — when a group's count moves n → n+1 the pair sum
  * gains exactly 2n — so the running λ after any stream prefix is
  * bit-identical to the batch rationals over that prefix, and state
  * stays bounded by the GROUP cardinality (sources, languages), never
  * the document count. Berger–Parker needs only the running max (counts
  * never decrease).
  *
  * Emits one running row per dimension per micro-batch:
  * (dimension, n_groups, n_docs, simpson_e6 (None while N < 2),
  * inv_simpson_e4 (None while Σ = 0), berger_parker_bp).
  */
class DiversityProcessor
    extends StatefulProcessor[String, (String, String), (String, Long, Long, Option[Long], Option[Long], Long)] {

  @transient private var counts: MapState[String, Long] = _
  // (nDocs, pairSum, maxN)
  @transient private var tot: ValueState[(Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    counts = getHandle.getMapState[String, Long](
      "groupCounts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
    tot = getHandle.getValueState[(Long, Long, Long)](
      "totals", Encoders.product[(Long, Long, Long)], TTLConfig.NONE)
  }

  override def handleInputRows(
      key: String,
      rows: Iterator[(String, String)],
      timerValues: TimerValues): Iterator[(String, Long, Long, Option[Long], Option[Long], Long)] = {
    var (n, ss, mx) = if (tot.exists()) tot.get() else (0L, 0L, 0L)
    rows.foreach { case (_, grp) =>
      val c = if (counts.containsKey(grp)) counts.getValue(grp) else 0L
      counts.updateValue(grp, c + 1)
      n += 1
      ss = Math.addExact(ss, 2L * c) // (c+1)c - c(c-1) = 2c
      if (c + 1 > mx) mx = c + 1
    }
    tot.update((n, ss, mx))
    if (n == 0L) Iterator.empty
    else {
      val nGroups = counts.keys().size.toLong
      val simpson = if (n < 2L) None else Some(1000000L * ss / (n * (n - 1L)))
      val inv = if (ss == 0L) None else Some(10000L * n * (n - 1L) / ss)
      Iterator((key, nGroups, n, simpson, inv, 10000L * mx / n))
    }
  }
}

object DiversityProcessor {

  /** Rows: (dimension, groupValue) → after each batch one running
    * (dimension, n_groups, n_docs, simpson_e6, inv_simpson_e4,
    * berger_parker_bp) row.
    */
  def apply(
      spark: SparkSession,
      rows: Dataset[(String, String)]): Dataset[(String, Long, Long, Option[Long], Option[Long], Long)] = {
    import spark.implicits._
    SeriesStatsProcessor.configure(spark)
    rows.groupByKey(_._1)
      .transformWithState(new DiversityProcessor, TimeMode.None(), OutputMode.Update())
  }
}
