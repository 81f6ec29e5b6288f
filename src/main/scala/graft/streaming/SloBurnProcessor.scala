package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of the batch `ts_slo_burn` operator: per-key
  * multi-window error-budget burn-rate monitoring (the SRE-workbook
  * fast+slow alerting pattern) maintained across micro-batches via
  * transformWithState, in the SAME integer arithmetic the batch query
  * runs: per hour-bucket h = ts ÷ 3600000000 µs, burn1 = ne·M ÷ n and
  * burn6 = the trailing sums over the last `windowHours` PRESENT buckets
  * (the batch `ROWS BETWEEN 5 PRECEDING` grid semantics), with
  * M = 10⁸ ÷ budgetBp (20% budget → 50000 — the batch constant). JVM
  * `Long` division truncates like Spark `DIV` and DuckDB `//`, so parity
  * is BIT-EXACT per emitted hour.
  *
  * State per key is a bounded ring of the `windowHours` most recent
  * hour-buckets (h, n, ne). Every batch re-emits EVERY affected bucket
  * (the touched hour and all retained hours after it, whose trailing
  * windows shift), so update-mode consumers converge on the batch row
  * per hour. Ordering contract (the watermark-shaped bound): points may
  * arrive out of order up to `windowHours` hour-buckets; data older than
  * the oldest retained bucket is folded into a NEW bucket position that
  * batch would have counted elsewhere — exactly the staleness a
  * watermark would have dropped.
  */
class SloBurnProcessor(
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
    // (key, ts_us, err 0/1) — bucket the micro-batch onto the hour grid
    val pts = rows.toArray
    if (pts.isEmpty) return Iterator.empty
    val buf0 = if (st.exists()) st.get().bs.toVector else Vector.empty[(Long, Long, Long)]
    val (buf, out) = SloBurnProcessor.step(key, buf0, pts, windowHours, mult,
      pageFastBp, pageSlowBp, ticketBp)
    st.update(SloBurnProcessor.Buckets(buf.takeRight(windowHours)))
    out.iterator
  }
}

object SloBurnProcessor {
  /** Bounded per-key state: the `windowHours` most recent hour-buckets. */
  case class Buckets(bs: Seq[(Long, Long, Long)])

  /** One micro-batch fold of the burn-rate ring — shared by the
    * unwatermarked processor and [[SloBurnLateProcessor]]: merge the
    * batch's hour-bucket deltas into the ring, re-emit every bucket from
    * the earliest touched hour on (their trailing windows shifted).
    * Returns (merged ring BEFORE the takeRight trim, emitted rows).
    */
  private[streaming] def step(
      key: Long,
      buf0: Vector[(Long, Long, Long)],
      pts: Array[(Long, Long, Long)],
      windowHours: Int,
      mult: Long,
      pageFastBp: Long,
      pageSlowBp: Long,
      ticketBp: Long): (Vector[(Long, Long, Long)], Seq[(Long, Long, Long, Long, Long, Long, Boolean, Boolean)]) = {
    val deltas = pts.groupBy(_._2 / 3600000000L)
      .map { case (h, rs) => (h, rs.length.toLong, rs.map(_._3).sum) }
      .toSeq.sortBy(_._1)
    var buf = buf0
    deltas.foreach { case (h, dn, dne) =>
      buf.indexWhere(_._1 == h) match {
        case -1 => buf = (buf :+ ((h, dn, dne))).sortBy(_._1)
        case i  => val (bh, n0, e0) = buf(i); buf = buf.updated(i, (bh, n0 + dn, e0 + dne))
      }
    }
    val minTouched = deltas.head._1
    val out = buf.zipWithIndex.collect { case ((h, n, ne), i) if h >= minTouched =>
      val win = buf.slice(math.max(0, i - (windowHours - 1)), i + 1)
      val nw = win.map(_._2).sum
      val new_ = win.map(_._3).sum
      val b1 = ne * mult / n
      val bw = new_ * mult / nw
      (key, h, n, ne, b1, bw, b1 >= pageFastBp && bw >= pageSlowBp, bw >= ticketBp)
    }
    (buf, out)
  }

  /** Rows: (key, ts_us, err 0/1) → per affected (key, hour) each
    * micro-batch: (key, h, n, ne, burn1_bp, burn6_bp, page, ticket) —
    * the batch query's exact output columns, keyed.
    */
  def apply(
      spark: SparkSession,
      rows: Dataset[(Long, Long, Long)],
      budgetBp: Long = 2000L,
      windowHours: Int = 6): Dataset[(Long, Long, Long, Long, Long, Long, Boolean, Boolean)] = {
    import spark.implicits._
    SeriesStatsProcessor.configure(spark)
    rows.groupByKey(_._1)
      .transformWithState(new SloBurnProcessor(budgetBp, windowHours),
        TimeMode.None(), OutputMode.Update())
  }
}
