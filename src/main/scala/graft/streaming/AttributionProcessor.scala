package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of the batch `q_attribution` enrichment: per-user
  * first/last-touch state maintained across micro-batches via
  * transformWithState; every purchase row is emitted ON ARRIVAL with
  * the touches credited by both single-touch models — the live
  * "conversion with its attribution" feed a marketing pipeline tails,
  * where the batch query is the daily reconciliation.
  *
  * Parity contract with the batch window fold: EXACT per purchase —
  * identical (last_touch, first_touch, revenue cents) — as long as each
  * user's events arrive in (ts, id) order ACROSS micro-batches (points
  * within one micro-batch are sorted before folding, so intra-batch
  * arrival order never matters; the same caveat as every
  * order-sensitive processor here). State is O(1) per user: two touch
  * strings.
  */
class AttributionProcessor
    extends StatefulProcessor[Long, (Long, Long, Long, String, Long), (Long, Long, Long, String, String, Long)] {

  // Option sentinel, NOT the empty string: the batch window fold
  // distinguishes NULL (no prior touch) from a literal "" event_type,
  // and unvalidated streaming input may carry "" — parity demands the
  // same distinction here (round-5 advice).
  @transient private var st: ValueState[(Option[String], Option[String])] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Option[String], Option[String])](
      "touches", Encoders.product[(Option[String], Option[String])], TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, Long, Long, String, Long)],
      timerValues: TimerValues): Iterator[(Long, Long, Long, String, String, Long)] = {
    // (user, ts, id, event_type, rev_c) sorted like the batch window order
    val pts = rows.toArray.sortBy(r => (r._2, r._3))
    var (first, last) =
      if (st.exists()) st.get() else (Option.empty[String], Option.empty[String])
    val out = Seq.newBuilder[(Long, Long, Long, String, String, Long)]
    pts.foreach { p =>
      if (p._4 == "purchase") {
        out += ((key, p._2, p._3,
          last.getOrElse("(none)"), first.getOrElse("(none)"), p._5))
      } else {
        if (first.isEmpty) first = Some(p._4)
        last = Some(p._4)
      }
    }
    st.update((first, last))
    out.result().iterator
  }
}

object AttributionProcessor {
  /** Rows: (user, ts, id, event_type, rev_c) → one row per purchase:
    * (user, ts, id, last_touch, first_touch, rev_c), "(none)" when the
    * purchase had no prior touch.
    */
  def apply(
      spark: SparkSession,
      rows: Dataset[(Long, Long, Long, String, Long)]): Dataset[(Long, Long, Long, String, String, Long)] = {
    import spark.implicits._
    SeriesStatsProcessor.configure(spark)
    rows.groupByKey(_._1)
      .transformWithState(new AttributionProcessor, TimeMode.None(), OutputMode.Update())
  }
}
