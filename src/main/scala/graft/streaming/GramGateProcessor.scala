package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of the span-dedup gram-index MATCH step — the
  * positional inverted-index join of `dedup_max_span`
  * ([[graft.queries.Dedup]]) run incrementally: documents arrive as
  * their positional k-gram rows (gram hash, doc id, position — the
  * [[graft.ops.Text.gramPositionIndex]] relation); state is keyed by
  * the GRAM HASH and holds the (doc, pos) occurrences seen so far;
  * every arrival emits a dotplot match row against each PRIOR
  * cross-document occurrence, oriented `doc_a < doc_b` like the batch
  * `m` relation. Downstream the matches feed the same
  * diagonal/gaps-and-islands aggregation as batch — so maximal shared
  * spans surface the moment the second copy of a boilerplate block
  * arrives, instead of at the next full-corpus sweep.
  *
  * Parity contract: after any prefix of the stream, the emitted match
  * set (deduped) equals the batch dotplot-match relation over the same
  * documents. Bucket membership is a SET, so this is ORDER-INSENSITIVE
  * under any arrival order — same contract as [[LshGateProcessor]].
  *
  * Hot-gram cap (the scale guard): once a gram's bucket holds `cap`
  * occurrences the bucket SATURATES — later arrivals are dropped
  * (never stored, never emitted), so state per gram and emit fan-out
  * per arrival are both ≤ `cap`, exactly the bound the batch
  * `n_occ <= 50` filter puts on the inverted-index self-join. The
  * semantics necessarily differ AT the cap: batch retroactively drops
  * a saturated gram entirely, a stream cannot retract — the gate keeps
  * the pairs among the first `cap` arrivals. Below the cap the two are
  * identical (the spec's corpus-parity case); corpora with genuinely
  * hot grams should cap upstream like batch if exact agreement at the
  * boundary matters.
  */
class GramGateProcessor(cap: Int = 50)
    extends StatefulProcessor[Long, (Long, Long, Long), (Long, Long, Long, Long)] {

  require(cap >= 1, "cap >= 1")

  @transient private var st: ValueState[GramGateProcessor.Members] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[GramGateProcessor.Members](
      "gram", Encoders.product[GramGateProcessor.Members], TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, Long, Long)],
      timerValues: TimerValues): Iterator[(Long, Long, Long, Long)] = {
    val seen = scala.collection.mutable.LinkedHashSet[(Long, Long)](
      (if (st.exists()) st.get().ms.map(m => (m._1, m._2)) else Seq.empty): _*)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    // intra-batch arrivals sorted by (doc, pos): deterministic emission
    rows.toArray.map(r => (r._2, r._3)).sorted.foreach { case (d, p) =>
      if (!seen.contains((d, p)) && seen.size < cap) {
        seen.foreach { case (d2, p2) =>
          // same-doc repeats are index members but never matches (the
          // batch join is strict doc_a < doc_b)
          if (d2 < d) out += ((d2, p2, d, p))
          else if (d2 > d) out += ((d, p, d2, p2))
        }
        seen += ((d, p))
      }
    }
    st.update(GramGateProcessor.Members(seen.toSeq))
    out.iterator
  }
}

object GramGateProcessor {
  /** Bucket state: (doc, pos) occurrences of one gram hash, ≤ cap. */
  case class Members(ms: Seq[(Long, Long)])

  /** Rows: (gram hash, doc id, position) → dotplot matches
    * (doc_a, pos_a, doc_b, pos_b), `doc_a < doc_b`; one emission per
    * colliding occurrence (dedupe downstream if a set is needed).
    */
  def apply(
      spark: SparkSession,
      rows: Dataset[(Long, Long, Long)],
      cap: Int = 50): Dataset[(Long, Long, Long, Long)] = {
    import spark.implicits._
    SeriesStatsProcessor.configure(spark)
    rows.groupByKey(_._1)
      .transformWithState(new GramGateProcessor(cap), TimeMode.None(), OutputMode.Update())
  }
}
