package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming deterministic weighted sample — the transformWithState twin
  * of `sample_priority` (priority sampling, Duffield/Lund/Thorup
  * JACM'07, with the md5-derived uniform draw): per stream key, keep the
  * k rows with the LARGEST priorities under the total order
  * (priority DESC, id ASC). Priorities arrive precomputed through the
  * shared [[graft.ops.Sample.prioritized]] expression — the stream and
  * the batch sample score identically by construction, so the final
  * streaming state equals the batch `ORDER BY priority DESC, id LIMIT k`
  * EXACTLY under ANY micro-batch split: top-k under a total order is
  * associative, commutative and idempotent ((id, priority) pairs are
  * deduplicated on merge, so replays are absorbed too). PRECONDITION:
  * ids must be UNIQUE per key (true for every doc_id source here) —
  * the merge-dedup that absorbs replays would also collapse a key
  * legitimately receiving the same (id, priority) twice into one slot,
  * while the batch ORDER BY/LIMIT reference would count it twice; with
  * non-unique sources, dedup the batch reference on id too. State is O(k)
  * per key forever — the bounded-memory reservoir every streaming
  * ingestion layer keeps for "sample N docs per source as they arrive".
  */
class BottomKProcessor(k: Int)
    extends StatefulProcessor[String, (String, Long, Long), (String, Long, Long, Long)] {

  require(k >= 1 && k <= 65536, "k in [1,65536]")

  @transient private var st: ValueState[BottomKProcessor.S] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[BottomKProcessor.S](
      "bottomk", Encoders.product[BottomKProcessor.S], TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[(String, Long, Long)],
      timerValues: TimerValues): Iterator[(String, Long, Long, Long)] = {
    val pts = rows.map(r => (r._2, r._3)).toSeq
    if (pts.isEmpty) Iterator.empty
    else {
      val prev = if (st.exists()) st.get().entries else Seq.empty
      val merged = (prev ++ pts).distinct
        .sortBy { case (id, p) => (-p, id) }.take(k)
      st.update(BottomKProcessor.S(merged))
      merged.iterator.zipWithIndex.map { case ((id, p), i) =>
        (key, id, p, (i + 1).toLong)
      }
    }
  }
}

object BottomKProcessor {
  /** The per-key reservoir: (id, priority) in emit order. */
  final case class S(entries: Seq[(Long, Long)])

  /** Rows: (key, id, priority) → per key per micro-batch, the current
    * sample: (key, id, priority, rank).
    */
  def apply(
      spark: SparkSession,
      rows: Dataset[(String, Long, Long)],
      k: Int): Dataset[(String, Long, Long, Long)] = {
    import spark.implicits._
    SeriesStatsProcessor.configure(spark)
    rows.groupByKey(_._1)
      .transformWithState(new BottomKProcessor(k), TimeMode.None(), OutputMode.Update())
  }
}
