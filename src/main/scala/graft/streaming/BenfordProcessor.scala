package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of the batch `quality_benford` first-digit audit:
  * per key, the running first-significant-digit distribution of exact
  * cent integers beside the Benford expectation — the live fraud /
  * synthetic-data screen. State is the per-digit count vector (≤ 10
  * entries: '1'..'9' plus whatever a hostile sign/zero contributes,
  * mirroring the batch string-head exactly); counts are pure sums, so
  * the processor is fully order-INSENSITIVE and every emission equals
  * the batch query over the rows seen so far, bit-for-bit (truncating
  * share_bp = n·10⁴ DIV total, the same pre-rounded integer Benford
  * table, None where the batch CASE yields NULL for a non-1-9 head).
  *
  * Scale note: the twin keys by an arbitrary partition column (the
  * test keys globally); at firehose scale the upstream should
  * pre-aggregate per-partition digit counts — they are associative —
  * and feed this as (key, digit-count deltas) instead of raw rows.
  */
class BenfordProcessor
    extends StatefulProcessor[String, (String, Long), (String, String, Long, Long, Long, Option[Long], Option[Long])] {

  @transient private var st: ValueState[BenfordProcessor.S] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[BenfordProcessor.S](
      "benford", Encoders.product[BenfordProcessor.S], TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[(String, Long)],
      timerValues: TimerValues): Iterator[(String, String, Long, Long, Long, Option[Long], Option[Long])] = {
    val prev = if (st.exists()) st.get() else BenfordProcessor.S(Seq.empty, Seq.empty)
    val counts = scala.collection.mutable.TreeMap.empty[String, Long]
    prev.digits.iterator.zip(prev.ns.iterator).foreach { case (d, n) => counts.update(d, n) }
    rows.foreach { case (_, cents) =>
      val d = cents.toString.substring(0, 1)
      counts.update(d, counts.getOrElse(d, 0L) + 1L)
    }
    st.update(BenfordProcessor.S(counts.keysIterator.toSeq, counts.valuesIterator.toSeq))
    val total = counts.valuesIterator.sum
    if (total == 0) Iterator.empty
    else counts.iterator.map { case (d, n) =>
      val share = n * 10000L / total
      val bb = BenfordProcessor.Expected.get(d)
      (key, d, n, total, share, bb, bb.map(b => math.abs(share - b)))
    }
  }
}

object BenfordProcessor {

  /** log10(1+1/d) in basis points — the SAME pre-rounded literal table
    * the batch CASE uses; heads outside '1'..'9' get None like the
    * batch NULL.
    */
  val Expected: Map[String, Long] = Map(
    "1" -> 3010L, "2" -> 1761L, "3" -> 1249L, "4" -> 969L, "5" -> 792L,
    "6" -> 669L, "7" -> 580L, "8" -> 512L, "9" -> 458L)

  /** Per-digit counts — parallel vectors for the product encoder. */
  final case class S(digits: Seq[String], ns: Seq[Long])

  /** Rows: (key, cents) in ANY order → per touched key each
    * micro-batch, one row per digit seen:
    * (key, digit, n, total, share_bp, benford_bp, dev_bp) — the batch
    * query's exact output columns.
    */
  def apply(
      spark: SparkSession,
      rows: Dataset[(String, Long)]): Dataset[(String, String, Long, Long, Long, Option[Long], Option[Long])] = {
    import spark.implicits._
    SeriesStatsProcessor.configure(spark)
    rows.groupByKey(_._1)
      .transformWithState(new BenfordProcessor, TimeMode.None(), OutputMode.Update())
  }
}
