package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Streaming twin of the `pipeline_resume_cursor` bucket census (r12
  * verdict task #6) — the preemption-recovery primitive maintained
  * LIVE beside ingestion instead of behind a batch job: keyed by
  * EPOCH, a position-bucket→count map (MapState) over the Feistel
  * positions of arriving doc ids. Bucket counts are associative sums
  * (the CountMin linearity class — no frozen reference), and every
  * emitted quantity is a pure function of the FINAL counts, so the
  * last row per (epoch, pct) is bit-identical to the batch census
  * over the same ids under ANY stream split or arrival order.
  *
  * Emits per (epoch, pct ∈ {25, 50, 75}): the target rank k, the
  * bucket holding the k-th smallest position, the in-bucket rank
  * offset, and the id count — the batch query's steps 1–2. The exact
  * cursor doc (step 3) stays a bounded per-bucket read the resuming
  * consumer does against storage; the whole point of the census is
  * that that read touches ONE hash-dispersed bucket, not the corpus.
  * State is bucket-cardinality-bounded (≤ 4096 per epoch —
  * [[graft.ops.Sample.CursorBucketWidth]]), never row-bounded.
  */
class ResumeCursorProcessor
    extends StatefulProcessor[Long, (Long, Long), (Long, Long, Long, Long, Long, Long)] {

  @transient private var counts: MapState[Long, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    counts = getHandle.getMapState[Long, Long](
      "bucketCounts", Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, Long)],
      timerValues: TimerValues): Iterator[(Long, Long, Long, Long, Long, Long)] = {
    rows.foreach { case (_, b) =>
      val cur = if (counts.containsKey(b)) counts.getValue(b) else 0L
      counts.updateValue(b, cur + 1)
    }
    val buckets = {
      val it = counts.iterator()
      val b = Array.newBuilder[(Long, Long)]
      while (it.hasNext) b += it.next()
      b.result().sortBy(_._1)
    }
    val n = buckets.iterator.map(_._2).sum
    if (n == 0L) Iterator.empty
    else Iterator(25L -> n / 4, 50L -> n / 2, 75L -> (3 * n) / 4)
      .filter(_._2 > 0) // the batch hit filter k > before admits no k=0 row
      .map { case (pct, k) =>
        // first bucket with cumulative count >= k (census walk — the
        // batch query's before < k <= before + c condition)
        var before = 0L
        var i = 0
        while (before + buckets(i)._2 < k) { before += buckets(i)._2; i += 1 }
        (key, pct, k, buckets(i)._1, k - before, n)
      }
  }
}

object ResumeCursorProcessor {

  /** The per-id expansion every producer shares: both epochs' (epoch,
    * bucket) rows of one doc id — driver Feistel
    * ([[graft.ops.Sample.feistelPos]], the pinned SQL twin). Lives
    * here, not in a test suite, so stream map functions never capture
    * a non-serializable fixture (the r11/r12 scalatest lesson).
    */
  def expand(docId: Long): Seq[(Long, Long)] =
    Seq(0L, 1L).map(e =>
      (e, graft.ops.Sample.feistelPos(docId, e) / graft.ops.Sample.CursorBucketWidth))

  /** Rows: (epoch, posBucket) → after each batch, one row per (epoch,
    * pct ∈ {25,50,75}): (epoch, pct, k, bucket, offset_in_bucket, n).
    * The final row per key equals the batch census over the same ids.
    */
  def apply(
      spark: SparkSession,
      rows: Dataset[(Long, Long)]): Dataset[(Long, Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    SeriesStatsProcessor.configure(spark)
    rows.groupByKey(_._1)
      .transformWithState(new ResumeCursorProcessor, TimeMode.None(), OutputMode.Update())
  }
}
