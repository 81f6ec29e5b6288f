package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of the batch `ts_matrix_profile` banded SAD profile:
  * per-key ring-buffer state over an in-order series stream, emitting
  * the running per-position profile (nearest-neighbor SAD within the
  * band). The batch band is symmetric (|j−i| ∈ [4, 48]), which a
  * stream realizes INCREMENTALLY: when subsequence j completes, the
  * pairs (i, j) for i ∈ [j−48, j−4] update BOTH endpoints — position
  * i's value is final once j reaches i+48, and the open tail keeps its
  * running min until the stream ends. Every emission carries the
  * monotone per-key arrival count as a version, so "max version per
  * position" is always the current (and eventually the batch-final)
  * answer.
  *
  * State is BAND-bounded, never data-bounded: the last 52 values (the
  * window needed to form every in-band subsequence pair) plus the ≤ 49
  * open positions' running (sad, nn) — the matrix-profile property
  * that makes it streamable at all (Yeh et al. ICDM'16 call this the
  * incremental/online regime).
  *
  * Parity contract: per-key rows must arrive in series order across
  * micro-batches (same caveat as every order-sensitive processor
  * here); rows within one micro-batch are sorted before folding. Ties
  * break exactly like the batch struct-min: lexicographic (sad, nn).
  */
class MatrixProfileProcessor
    extends StatefulProcessor[String, (String, Long, Long), (String, Long, Long, Long, Long)] {

  import MatrixProfileProcessor.{Band, Excl, Win}

  @transient private var st: ValueState[MatrixProfileProcessor.S] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[MatrixProfileProcessor.S](
      "mp", Encoders.product[MatrixProfileProcessor.S], TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[(String, Long, Long)],
      timerValues: TimerValues): Iterator[(String, Long, Long, Long, Long)] = {
    val prev = if (st.exists()) st.get()
      else MatrixProfileProcessor.S(0L, Seq.empty, Seq.empty, Seq.empty, Seq.empty)
    var n = prev.n
    val ring = scala.collection.mutable.ArrayBuffer.from(prev.ring)
    val prof = scala.collection.mutable.LinkedHashMap.empty[Long, (Long, Long)]
    prev.pPos.iterator.zip(prev.pSad.iterator.zip(prev.pNn.iterator))
      .foreach { case (p, sn) => prof.update(p, sn) }
    val touched = scala.collection.mutable.LinkedHashSet.empty[Long]
    // ring(k) holds the value at 1-based position n - ring.length + 1 + k
    rows.toArray.sortBy(r => r._2).foreach { r =>
      ring += r._3
      n += 1L
      val keep = Band + Win // 52: positions n-51..n cover every in-band pair
      if (ring.length > keep) ring.remove(0, ring.length - keep)
      val s = n - (Win - 1) // subsequence s completes on value n
      if (s >= 1) {
        val base = n - ring.length + 1 // position of ring(0)
        def v(pos: Long): Long = ring((pos - base).toInt)
        def sad(a: Long, b: Long): Long = {
          var k = 0; var d = 0L
          while (k < Win) { d += math.abs(v(a + k) - v(b + k)); k += 1 }
          d
        }
        var i = math.max(1L, s - Band)
        while (i <= s - Excl) {
          if (i >= base) {
            val d = sad(i, s)
            def upd(p: Long, nn: Long): Unit = prof.get(p) match {
              case Some((cd, cn)) if cd < d || (cd == d && cn <= nn) => ()
              case _ => prof.update(p, (d, nn)); touched += p
            }
            upd(i, s); upd(s, i)
          }
          i += 1
        }
      }
    }
    // positions finalized before the open window are emitted below and
    // dropped from state; open positions stay
    val openFrom = n - (Win - 1) - Band // oldest position a future pair can touch
    val (closed, open) = prof.partition(_._1 < openFrom)
    val out = (closed.keysIterator ++ open.keysIterator.filter(touched.contains))
      .toArray.sorted.map { p =>
        val (d, nn) = prof(p); (key, p, d, nn, n)
      }
    st.update(MatrixProfileProcessor.S(n, ring.toSeq,
      open.keysIterator.toSeq, open.valuesIterator.map(_._1).toSeq,
      open.valuesIterator.map(_._2).toSeq))
    out.iterator
  }
}

object MatrixProfileProcessor {
  val Win = 4      // subsequence length
  val Excl = 4     // exclusion zone (= window: no trivial matches)
  val Band = 48    // band radius in positions

  /** Ring of the last ≤ 52 values plus the open positions' running
    * (sad, nn) — parallel vectors for the product encoder. `n` is the
    * monotone per-key arrival count (the emission version).
    */
  final case class S(n: Long, ring: Seq[Long],
      pPos: Seq[Long], pSad: Seq[Long], pNn: Seq[Long])

  /** Rows: (key, order, value) arriving in `order` per key → rows
    * (key, pos, sad, nn, version): the running banded profile; the row
    * with the max version per (key, pos) is the current profile entry
    * and, once the stream drains, equals the batch profile.
    */
  def apply(
      spark: SparkSession,
      rows: Dataset[(String, Long, Long)]): Dataset[(String, Long, Long, Long, Long)] = {
    import spark.implicits._
    SeriesStatsProcessor.configure(spark)
    rows.groupByKey(_._1)
      .transformWithState(new MatrixProfileProcessor, TimeMode.None(), OutputMode.Append())
  }
}
