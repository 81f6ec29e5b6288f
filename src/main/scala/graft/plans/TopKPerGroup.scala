package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Whole-operator custom plan: top-k rows per group under a TOTAL sort
  * order — the `row_number() OVER (PARTITION BY g ORDER BY o) <= k`
  * pattern, executed the way a distributed engine should: a bounded
  * per-partition selection BEFORE the exchange (at most k rows per
  * (group, input partition) cross the wire) and a bounded final
  * selection after it. The window form materializes and SORTS every
  * group in full on the reduce side; here the shuffle shrinks from
  * |data| to ≤ k·|groups|·|maps| rows — the difference between "works
  * at 100 TB" and "sorts 100 TB to keep 3 rows per key".
  *
  * Memory story (both stages bounded regardless of group cardinality or
  * payload width):
  *  - the PARTIAL stage's hash map is byte-accounted; past
  *    `graft.topKPerGroup.flushBytes` (default 64 MiB) it emits its
  *    current per-group selections downstream and clears — correct
  *    because the final stage re-selects (the same degrade-to-passthrough
  *    move as Spark's partial hash aggregate);
  *  - the FINAL stage holds O(1) rows: it declares a required child
  *    ordering of (group, order), EnsureRequirements plans Spark's
  *    spill-capable partition-local SortExec over the ALREADY-BOUNDED
  *    shuffle output, and the selection is then a streaming
  *    first-k-per-group pass.
  *
  * Semantics contract: `order` must be a TOTAL order (tie-broken) —
  * the same determinism rule every oracle query here already follows;
  * under a total order partial∘final top-k composes exactly. Group keys
  * must be types whose sort-equality matches byte-equality (string /
  * integral / date — NOT raw floats, where −0.0 and NaN payloads sort
  * equal but differ in bytes; normalize such keys first, as Spark's own
  * aggregate does via NormalizeFloatingNumbers). The
  * Catalyst ladder rung (c): logical node + strategy + physical
  * operator, injected via [[graft.expressions.GraftExtensions]] or
  * imperatively through `spark.experimental.extraStrategies`
  * ([[graft.ops.Scale.topKPerGroup]]).
  */
case class TopKPerGroup(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan,
    rankAttr: Option[Attribute] = None) extends UnaryNode {
  require(k > 0, s"topKPerGroup: k must be positive, got $k")
  // `rankAttr` (r8 verdict #5): optionally EMIT the per-group 1-based
  // rank as a produced column — the final stage's streaming selection
  // counts it for free, so `row_number()` consumers that keep the rank
  // still get the bounded-exchange plan instead of a WindowExec. The
  // attribute carries the ORIGINAL window alias's exprId, so projections
  // above the rewritten filter resolve unchanged.
  override def output: Seq[Attribute] = child.output ++ rankAttr.toSeq
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr.toSeq)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

/** Plans [[TopKPerGroup]] as partial → (exchange via required
  * distribution) → (bounded local sort via required ordering) → final.
  * EnsureRequirements inserts the single hash exchange and the
  * partition-local sort the final stage declares.
  */
object TopKPerGroupStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, child, rank) =>
      // only the final stage can know the true rank: partial selections
      // are per-map-partition and get re-selected after the exchange
      val partialStage =
        TopKPerGroupExec(g, o, k, planLater(child), partial = true, rankAttr = None)
      TopKPerGroupExec(g, o, k, partialStage, partial = false, rankAttr = rank) :: Nil
    case _ => Nil
  }
}

/** The bounded selection. Partial: per input partition, a hash map from
  * group key to an overflow buffer capped at 2k rows (when it fills,
  * sort and truncate to k — amortized O(log k) per row); the whole map
  * is byte-accounted and flushed downstream past the budget, so
  * partial-stage memory is bounded even for high-cardinality keys with
  * wide payloads. Final: required child ordering (group, order) makes
  * the selection a streaming first-k-per-group pass — Spark's SortExec
  * (spill-capable) does the per-partition grouping work over the
  * shuffle output the partial stage already bounded to
  * ≤ k·|groups|·|maps| rows.
  */
case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan,
    partial: Boolean,
    rankAttr: Option[Attribute] = None) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ rankAttr.toSeq
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr.toSeq)
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(groupExprs))
  private def groupedOrdering: Seq[SortOrder] =
    groupExprs.map(e => SortOrder(e, Ascending)) ++ order
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    if (partial) Seq(Nil) else Seq(groupedOrdering)
  override def outputOrdering: Seq[SortOrder] =
    if (partial) Nil else groupedOrdering

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] =
    if (partial) doExecutePartial() else doExecuteFinal()

  /** Map-side bounded selection with a byte-accounted flush: correctness
    * never depends on the map surviving the whole partition — anything
    * flushed early is re-selected by the final stage.
    */
  private def doExecutePartial(): RDD[InternalRow] = {
    val childOutput = child.output
    val groupProjExprs = groupExprs
    val boundOrder = order.map(BindReferences.bindReference(_, childOutput))
    val kk = k
    val flushBytes = conf.getConfString(
      "graft.topKPerGroup.flushBytes", (64L * 1024 * 1024).toString).toLong
    val fieldCount = childOutput.size
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(groupProjExprs, childOutput)
      val ord = GenerateOrdering.generate(boundOrder)
      val groups = new java.util.HashMap[UnsafeRow, java.util.ArrayList[InternalRow]]()
      var bytes = 0L
      def rowBytes(r: InternalRow): Long = r match {
        case u: UnsafeRow => u.getSizeInBytes.toLong + 16L // payload + object header-ish
        case _ => 64L + 8L * fieldCount                    // conservative non-unsafe estimate
      }
      def shrinkAccounted(buf: java.util.ArrayList[InternalRow]): Unit = {
        buf.sort(ord)
        while (buf.size() > kk) {
          val r = buf.remove(buf.size() - 1)
          bytes -= rowBytes(r)
        }
      }
      import scala.jdk.CollectionConverters._
      new Iterator[InternalRow] {
        private var out: Iterator[InternalRow] = Iterator.empty
        private def flush(): Iterator[InternalRow] = {
          val bufs = new java.util.ArrayList(groups.values())
          groups.clear(); bytes = 0L
          bufs.iterator().asScala.flatMap { buf =>
            buf.sort(ord)
            while (buf.size() > kk) buf.remove(buf.size() - 1)
            buf.iterator().asScala
          }
        }
        override def hasNext: Boolean = {
          while (!out.hasNext && (iter.hasNext || !groups.isEmpty)) {
            var over = false
            while (iter.hasNext && !over) {
              val row = iter.next()
              val key = keyProj(row)
              var buf = groups.get(key)
              if (buf == null) {
                buf = new java.util.ArrayList[InternalRow](math.min(kk * 2, 16))
                val keyCopy = key.copy()
                groups.put(keyCopy, buf)
                bytes += keyCopy.getSizeInBytes.toLong + 48L
              }
              val copied = row.copy()
              buf.add(copied)
              bytes += rowBytes(copied)
              if (buf.size() >= kk * 2) shrinkAccounted(buf)
              if (bytes > flushBytes) over = true
            }
            out = flush()
          }
          out.hasNext
        }
        override def next(): InternalRow = out.next()
      }
    }, preservesPartitioning = true)
  }

  /** Reduce-side streaming selection over (group, order)-sorted input:
    * the first k rows of each group ARE the top-k, so memory per task is
    * one key copy + the in-flight row. When `rankAttr` is set, the
    * selection counter IS the per-group row_number — appended via one
    * bounded unsafe projection per emitted row (≤ k·|groups| total).
    */
  private def doExecuteFinal(): RDD[InternalRow] = {
    val childOutput = child.output
    val groupProjExprs = groupExprs
    val kk = k
    val outAttrs = output
    val emitRank = rankAttr.isDefined
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(groupProjExprs, childOutput)
      val rankProj =
        if (emitRank) UnsafeProjection.create(outAttrs, outAttrs) else null
      val rankRow =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
      new Iterator[InternalRow] {
        private var curKey: UnsafeRow = null
        private var emitted = 0
        private var pending: InternalRow = null
        private def advance(): Unit = {
          pending = null
          while (pending == null && iter.hasNext) {
            val row = iter.next()
            val key = keyProj(row)
            if (curKey == null || key != curKey) {
              curKey = key.copy()
              emitted = 0
            }
            if (emitted < kk) {
              emitted += 1
              // the source buffer is reused by the sorter: copy either way
              pending = if (emitRank) {
                rankRow.update(0, emitted)
                rankProj(joined(row, rankRow)).copy()
              } else row.copy()
            }
          }
        }
        advance()
        override def hasNext: Boolean = pending != null
        override def next(): InternalRow = {
          val r = pending
          advance()
          r
        }
      }
    }, preservesPartitioning = true)
  }
}

object TopKPerGroup {
  /** Idempotently make the strategy available on a session that was
    * built without [[graft.expressions.GraftExtensions]] — the
    * imperative twin of the config-driven injection, for sessions the
    * caller owns (the driver's harness session, tests).
    */
  def ensureStrategy(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKPerGroupStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerGroupStrategy
}
