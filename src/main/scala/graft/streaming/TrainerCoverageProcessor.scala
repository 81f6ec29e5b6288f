package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Streaming twin of the UNIGRAM rows of `pipeline_trainer_coverage`
  * (r11 verdict task #5): keyed by corpus, the same word→count
  * MapState as [[UnigramProcessor]] accumulates exact word statistics,
  * and after every micro-batch the coverage census re-runs on the
  * accumulated stats via the SHARED
  * [[graft.ops.Unigram.coverageCensus]] — pure integer driver
  * arithmetic over a vocabulary-bounded table, so each emission equals
  * the batch diagnostic's unigram rows OF ITS PREFIX bit-for-bit under
  * ANY split of the stream, and the final emission equals the batch
  * query's rows over the full corpus (pinned e2e in StreamingSpec,
  * with a checkpoint-restart leg).
  *
  * The `wordpiece_merge_mass` row is deliberately NOT twinned: its
  * seen-mass depends on the adopted merges, which re-scan the corpus
  * per round — corpus-sized work the census contract of this processor
  * family excludes (documented divergence, same class as the frozen-
  * reference rank statistics).
  *
  * Emits per touched key per batch: (key, trainer, cap, units, seen,
  * total) — one row per unigram coverage bound.
  */
class TrainerCoverageProcessor
    extends StatefulProcessor[String, (String, String, Long), (String, String, Long, String, Long, Long)] {

  @transient private var counts: MapState[String, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    counts = getHandle.getMapState[String, Long](
      "wordCounts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[(String, String, Long)],
      timerValues: TimerValues): Iterator[(String, String, Long, String, Long, Long)] = {
    rows.foreach { case (_, w, c) =>
      val cur = if (counts.containsKey(w)) counts.getValue(w) else 0L
      counts.updateValue(w, cur + c)
    }
    val stats = {
      val b = Seq.newBuilder[(String, Long)]
      val it = counts.iterator()
      while (it.hasNext) { val kv = it.next(); b += kv._1 -> kv._2 }
      b.result()
    }
    if (stats.isEmpty) Iterator.empty
    else graft.ops.Unigram.coverageCensus(stats).iterator
      .map { case (t, cap, units, seen, total) => (key, t, cap, units, seen, total) }
  }
}

object TrainerCoverageProcessor {

  /** Rows: (corpusKey, word, cnt) → after each batch one running
    * coverage row per unigram bound per touched key; the final rows
    * equal the batch diagnostic's unigram rows on the full stream.
    */
  def apply(
      spark: SparkSession,
      rows: Dataset[(String, String, Long)]): Dataset[(String, String, Long, String, Long, Long)] = {
    import spark.implicits._
    SeriesStatsProcessor.configure(spark)
    rows.groupByKey(_._1)
      .transformWithState(new TrainerCoverageProcessor, TimeMode.None(), OutputMode.Update())
  }
}
