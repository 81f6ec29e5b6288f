package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, SortOrder, UnsafeProjection, UnsafeRow}
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
  * group in full on the reduce side; this never holds more than 2k rows
  * per live group anywhere, so the shuffle shrinks from |data| to
  * ≤ k·|groups|·|maps| and the full-sort spill path disappears — the
  * difference between "works at 100 TB" and "sorts 100 TB to keep 3
  * rows per key".
  *
  * Semantics contract: `order` must be a TOTAL order (tie-broken) —
  * the same determinism rule every oracle query here already follows;
  * under a total order partial∘final top-k composes exactly. The
  * Catalyst ladder rung (c): logical node + strategy + physical
  * operator, injected via [[graft.expressions.GraftExtensions]] or
  * imperatively through `spark.experimental.extraStrategies`
  * ([[graft.ops.Scale.topKPerGroup]]).
  */
case class TopKPerGroup(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"topKPerGroup: k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

/** Plans [[TopKPerGroup]] as partial → (exchange via required
  * distribution) → final. Both stages run the same bounded selection;
  * EnsureRequirements inserts the single hash exchange the final stage
  * declares.
  */
object TopKPerGroupStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, child) =>
      val partialStage = TopKPerGroupExec(g, o, k, planLater(child), partial = true)
      TopKPerGroupExec(g, o, k, partialStage, partial = false) :: Nil
    case _ => Nil
  }
}

/** The bounded selection: per input partition, a hash map from group
  * key to an overflow buffer capped at 2k rows — when it fills, sort
  * and truncate to k (amortized O(log k) per row, never more than 2k
  * rows per live group in memory). `partial = true` keeps the child's
  * partitioning and asks for nothing; the final stage requires
  * [[ClusteredDistribution]] on the group key, which is what turns the
  * pair into partial → shuffle(k·groups·maps rows) → final.
  */
case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan,
    partial: Boolean) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(groupExprs))

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val groupProjExprs = groupExprs
    val boundOrder = order.map(BindReferences.bindReference(_, childOutput))
    val kk = k
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(groupProjExprs, childOutput)
      val ord = GenerateOrdering.generate(boundOrder)
      val groups = new java.util.HashMap[UnsafeRow, java.util.ArrayList[InternalRow]]()
      def shrink(buf: java.util.ArrayList[InternalRow]): Unit = {
        buf.sort(ord)
        while (buf.size() > kk) buf.remove(buf.size() - 1)
      }
      iter.foreach { row =>
        val key = keyProj(row)
        var buf = groups.get(key)
        if (buf == null) {
          buf = new java.util.ArrayList[InternalRow](math.min(kk * 2, 16))
          groups.put(key.copy(), buf)
        }
        buf.add(row.copy())
        if (buf.size() >= kk * 2) shrink(buf)
      }
      import scala.jdk.CollectionConverters._
      groups.values().iterator().asScala.flatMap { buf =>
        shrink(buf)
        buf.iterator().asScala
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
