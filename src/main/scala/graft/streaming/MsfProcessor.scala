package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** ONLINE minimum spanning forest — the streaming twin of the batch
  * [[graft.ops.Graph.msfEdges]] Borůvka: per key, the forest is
  * maintained under edge ARRIVALS by the cycle property (Tarjan's
  * online-MST folklore — public): a new edge joining two trees is
  * added; one closing a cycle replaces the cycle's maximum edge iff it
  * is lighter under the strict (w, lo, hi) order. Because the MSF is
  * UNIQUE under that order, the drained stream equals the batch forest
  * for ANY arrival order or micro-batch slicing — the same order-free
  * contract as the HDR sketch processor, proved the same way in
  * StreamingSpec (global shuffle, mid-key split).
  *
  * State is FOREST-bounded: ≤ |V|−1 edges per key, independent of how
  * many edges stream past — the right shape when keys are bounded
  * communities/partitions (the per-key vertex domain is the documented
  * contract; an unbounded vertex domain belongs in the batch op).
  *
  * Emits the full forest per key per micro-batch, versioned by the
  * monotone processed-edge count: rows carrying the max version per
  * key ARE the current forest (earlier versions are superseded whole).
  */
class MsfProcessor
    extends StatefulProcessor[String, (String, Long, Long, Long), (String, Long, Long, Long, Long)] {

  @transient private var st: ValueState[MsfProcessor.S] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[MsfProcessor.S](
      "msf", Encoders.product[MsfProcessor.S], TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[(String, Long, Long, Long)],
      timerValues: TimerValues): Iterator[(String, Long, Long, Long, Long)] = {
    val prev = if (st.exists()) st.get() else MsfProcessor.S(Seq.empty, 0L)
    // forest as a mutable edge set; adjacency rebuilt per batch (forest
    // is state-bounded, so this is cheap)
    val forest = scala.collection.mutable.Set.from(
      prev.es.map(e => (e._1, e._2, e._3)))
    var n = prev.n
    rows.foreach { r =>
      n += 1L
      val (lo, hi, w) = (math.min(r._2, r._3), math.max(r._2, r._3), r._4)
      if (lo != hi) {
        // path between lo and hi in the forest, tracking the max edge
        // under (w, lo, hi); None if disconnected
        val adj = scala.collection.mutable.HashMap
          .empty[Long, List[(Long, (Long, Long, Long))]].withDefaultValue(Nil)
        forest.foreach { e =>
          adj(e._1) = (e._2, e) :: adj(e._1)
          adj(e._2) = (e._1, e) :: adj(e._2)
        }
        def ord(e: (Long, Long, Long)) = (e._3, e._1, e._2)
        val maxOnPath: Option[(Long, Long, Long)] = {
          val seen = scala.collection.mutable.Set(lo)
          var frontier = List((lo, Option.empty[(Long, Long, Long)]))
          var found: Option[Option[(Long, Long, Long)]] = None
          while (found.isEmpty && frontier.nonEmpty) {
            val next = scala.collection.mutable.ListBuffer
              .empty[(Long, Option[(Long, Long, Long)])]
            frontier.foreach { case (v, mx) =>
              adj(v).foreach { case (u, e) =>
                if (found.isEmpty && !seen.contains(u)) {
                  seen += u
                  val mx2 = Some(mx.filter(m => Ordering[(Long, Long, Long)]
                    .gt(ord(m), ord(e))).getOrElse(e))
                  if (u == hi) found = Some(mx2) else next += ((u, mx2))
                }
              }
            }
            frontier = next.toList
          }
          found.flatten
        }
        maxOnPath match {
          case None => forest += ((lo, hi, w))
          case Some(mx) if Ordering[(Long, Long, Long)].lt((w, lo, hi), ord(mx)) =>
            forest -= mx; forest += ((lo, hi, w))
          case _ => ()
        }
      }
    }
    st.update(MsfProcessor.S(forest.toSeq.sorted, n))
    forest.toSeq.sorted.iterator.map(e => (key, e._1, e._2, e._3, n))
  }
}

object MsfProcessor {
  /** The forest edges (sorted for stable state) + the monotone
    * processed-edge count versioning emissions.
    */
  final case class S(es: Seq[(Long, Long, Long)], n: Long)

  /** Rows: (key, src, dst, w) in any order → the full current forest
    * per key per micro-batch as (key, lo, hi, w, version); rows with
    * the max version per key are the current forest.
    */
  def apply(
      spark: SparkSession,
      rows: Dataset[(String, Long, Long, Long)]): Dataset[(String, Long, Long, Long, Long)] = {
    import spark.implicits._
    SeriesStatsProcessor.configure(spark)
    rows.groupByKey(_._1)
      .transformWithState(new MsfProcessor, TimeMode.None(), OutputMode.Append())
  }
}
