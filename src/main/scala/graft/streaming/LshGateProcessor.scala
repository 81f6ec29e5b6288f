package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming near-duplicate CANDIDATE GATE — the banded-LSH collision
  * join of [[graft.ops.Lsh.candidatePairs]] run as a stream: documents
  * arrive with their banded signature rows (band, band-signature,
  * doc id); state is keyed by the (band, bsig) BUCKET and holds the doc
  * ids seen in that bucket; every arrival emits a candidate pair
  * against each PRIOR bucket member. This is the admission path of an
  * incremental dedup pipeline — candidates stream out the moment the
  * colliding document arrives, and the expensive exact-verify step
  * (shingle Jaccard) runs on candidates only, exactly like batch.
  *
  * Parity contract: after any prefix of the stream, the emitted pair
  * set (deduped — a pair colliding in k bands is emitted k times, once
  * per bucket) equals the batch candidatePairs set over the same
  * documents. Bucket membership is ORDER-INSENSITIVE (a set), so this
  * holds under any arrival order — no ordering precondition at all,
  * unlike the fold-state twins.
  *
  * Scale: state is one row-list per OCCUPIED bucket — Σ over docs of
  * `bands` entries, RocksDB-backed like every transformWithState op;
  * the emit fan-out per arrival is the bucket's occupancy, the same
  * quantity that bounds the batch self-join (cap hot buckets upstream
  * with [[graft.ops.Scale.capGroups]] if a degenerate signature
  * appears).
  */
class LshGateProcessor
    extends StatefulProcessor[String, (String, Long), (Long, Long)] {

  @transient private var st: ValueState[LshGateProcessor.Bucket] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[LshGateProcessor.Bucket](
      "bucket", Encoders.product[LshGateProcessor.Bucket], TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[(String, Long)],
      timerValues: TimerValues): Iterator[(Long, Long)] = {
    val seen = scala.collection.mutable.LinkedHashSet[Long](
      (if (st.exists()) st.get().ids else Seq.empty): _*)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    // intra-batch arrivals sorted by id: deterministic emission order,
    // and (lo, hi) orientation matches the batch d1 < d2 contract
    rows.toArray.map(_._2).sorted.foreach { id =>
      if (!seen.contains(id)) {
        seen.foreach { prior =>
          out += (if (prior < id) (prior, id) else (id, prior))
        }
        seen += id
      }
    }
    st.update(LshGateProcessor.Bucket(seen.toSeq))
    out.iterator
  }
}

object LshGateProcessor {
  /** Bucket state: the doc ids seen under one (band, bsig) key. */
  case class Bucket(ids: Seq[Long])

  /** Rows: (bucketKey = "band|bsig", doc id) → candidate pairs
    * (d1 &lt; d2), one emission per colliding bucket (dedupe downstream
    * if a set is needed — batch candidatePairs applies .distinct too).
    */
  def apply(
      spark: SparkSession,
      rows: Dataset[(String, Long)]): Dataset[(Long, Long)] = {
    import spark.implicits._
    SeriesStatsProcessor.configure(spark)
    rows.groupByKey(_._1)
      .transformWithState(new LshGateProcessor, TimeMode.None(), OutputMode.Update())
  }
}
