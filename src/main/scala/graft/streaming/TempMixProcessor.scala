package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of the batch α = 1/2 temperature-mix allocator
  * ([[graft.ops.Sample.temperatureAlloc]]): maintains per-stratum row
  * counts across micro-batches and re-emits the FULL allocation
  * manifest after every batch — the live "how should the next training
  * shard mix sources" control signal. Identical arithmetic to the batch
  * op: exact integer sqrt (floor of the correctly-rounded double sqrt,
  * corrected ±1 by squaring) and cumulative-quota apportionment
  * (⌊B·cum ⁄ T⌋ diffs, telescoping to exactly B) in JVM `Long` math ≡
  * Spark `DIV` ≡ DuckDB `//`, so parity is BIT-EXACT at every batch
  * boundary, not just at convergence.
  *
  * This is a CONTROL-PLANE operator: state is #strata-sized and the
  * whole computation keys to one group. Feed it per-source COUNT DELTAS
  * (pre-reduced upstream — e.g. each micro-batch's per-source counts),
  * not raw rows, when the stream is large; the twin accepts any
  * (stratum, delta) rows and sums them.
  */
class TempMixProcessor(budget: Long)
    extends StatefulProcessor[Long, (String, Long), (String, Long, Long, Long)] {

  require(budget >= 0)

  @transient private var st: ValueState[TempMixProcessor.Counts] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[TempMixProcessor.Counts](
      "mix", Encoders.product[TempMixProcessor.Counts], TTLConfig.NONE)

  /** Exact integer sqrt: floor(Math.sqrt) corrected by squaring — the
    * same ±1 correction the batch SQL applies, so no float boundary can
    * diverge. */
  private def isqrt(n: Long): Long = {
    val k0 = math.floor(math.sqrt(n.toDouble)).toLong
    if ((k0 + 1) * (k0 + 1) <= n) k0 + 1
    else if (k0 * k0 > n) k0 - 1
    else k0
  }

  override def handleInputRows(
      key: Long,
      rows: Iterator[(String, Long)],
      timerValues: TimerValues): Iterator[(String, Long, Long, Long)] = {
    val deltas = rows.toSeq.groupBy(_._1).map { case (s, rs) => s -> rs.map(_._2).sum }
    if (deltas.isEmpty) return Iterator.empty
    val counts = scala.collection.mutable.HashMap[String, Long](
      (if (st.exists()) st.get().cs else Seq.empty): _*)
    deltas.foreach { case (s, d) => counts.update(s, counts.getOrElse(s, 0L) + d) }
    val ordered = counts.toSeq.sortBy(_._1)
    st.update(TempMixProcessor.Counts(ordered))
    val weights = ordered.map { case (s, n) => (s, n, isqrt(n)) }
    val tw = weights.map(_._3).sum
    var cum = 0L
    weights.map { case (s, n, w) =>
      cum += w
      val alloc = if (tw == 0) 0L
        else (budget * cum) / tw - (budget * (cum - w)) / tw
      (s, n, w, alloc)
    }.iterator
  }
}

object TempMixProcessor {
  /** #strata-sized state: (stratum, cumulative row count). */
  case class Counts(cs: Seq[(String, Long)])

  /** Rows: (stratum, count delta) → after each micro-batch the full
    * manifest: (stratum, n_rows, weight, alloc) — the batch op's exact
    * output columns.
    */
  def apply(
      spark: SparkSession,
      rows: Dataset[(String, Long)],
      budget: Long): Dataset[(String, Long, Long, Long)] = {
    import spark.implicits._
    SeriesStatsProcessor.configure(spark)
    rows.groupByKey(_ => 0L)
      .transformWithState(new TempMixProcessor(budget), TimeMode.None(), OutputMode.Update())
  }
}
