package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Streaming twin of the unigram-LM tokenizer TRAINER
  * (`pipeline_unigram_vocab` / [[graft.ops.Unigram]]): keyed by corpus,
  * a word→count MapState accumulates the exact word statistics (counts
  * are associative, so the map after any stream prefix equals the
  * batch word-count over that prefix), and after every micro-batch the
  * WHOLE deterministic EM-prune trainer re-runs on the accumulated
  * stats — `trainFromStats` on the FULL map (cap-free, like the r12
  * batch trainer): pure fixed-point Long arithmetic, vocabulary-
  * bounded, the same counted-small economics as the batch driver
  * fast path. The final emission therefore
  * equals the batch-trained vocabulary BIT-FOR-BIT under ANY split of
  * the stream (the RidgeProcessor/LdaProcessor contract), and each
  * intermediate emission is the exact vocabulary OF ITS PREFIX — the
  * evolving-tokenizer feed a [[LdaServe.ModelRegistry]]-style serving
  * layer would subscribe to.
  *
  * State is bounded by the WORD DOMAIN, not the row count (the
  * KAnonymityProcessor argument); corpora with unbounded vocabularies
  * would cap the map by count-min + heavy-keeper instead — documented
  * divergence, not needed for any certified input.
  *
  * Emits per touched key per batch: (key, distinct_words, total_words,
  * vocab) where `vocab` is the canonical "piece:usage:cost" listing
  * sorted by piece — bounded (≤ chars + KeepMulti entries) and
  * directly comparable to the batch trainer's output.
  */
class UnigramProcessor
    extends StatefulProcessor[String, (String, String, Long), (String, Long, Long, String)] {

  @transient private var counts: MapState[String, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    counts = getHandle.getMapState[String, Long](
      "wordCounts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[(String, String, Long)],
      timerValues: TimerValues): Iterator[(String, Long, Long, String)] = {
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
    else {
      // cap-free, matching the r12 batch trainer: trainFromStats is
      // order-independent over the stats multiset (all its internal
      // selections sort totally, ties in UTF-8 byte order), so the
      // MapState iteration order never matters
      val vocab = graft.ops.Unigram.trainFromStats(stats)
      Iterator((key, stats.size.toLong, stats.map(_._2).sum,
        UnigramProcessor.render(vocab)))
    }
  }
}

object UnigramProcessor {

  /** Canonical bounded rendering of a trained vocabulary — the string
    * both the processor and the batch-parity assert compare.
    */
  def render(vocab: Seq[graft.ops.Unigram.Piece]): String =
    vocab.sortBy(_.piece)(graft.ops.Unigram.utf8Ordering)
      .map(p => s"${p.piece}:${p.usage}:${p.cost}").mkString(" ")

  /** Rows: (corpusKey, word, cnt) → after each batch one running
    * (corpusKey, distinct_words, total_words, vocab) row per touched
    * key; the final row equals the batch trainer on the full stream.
    */
  def apply(
      spark: SparkSession,
      rows: Dataset[(String, String, Long)]): Dataset[(String, Long, Long, String)] = {
    import spark.implicits._
    SeriesStatsProcessor.configure(spark)
    rows.groupByKey(_._1)
      .transformWithState(new UnigramProcessor, TimeMode.None(), OutputMode.Update())
  }
}
