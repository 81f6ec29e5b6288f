package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, CurrentRow, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, PredicateHelper, RowFrame, RowNumber, SpecifiedWindowFrame, UnboundedPreceding, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, DoubleType, FloatType, IntegerType, LongType, ShortType}

/** Optimizer rule: rewrite the `row_number() OVER (PARTITION BY g
  * ORDER BY o) <= k` filter idiom into the bounded [[TopKPerGroup]]
  * operator — the Catalyst ladder's "whole-operator" rung applied
  * AUTOMATICALLY, so every query written in the ubiquitous window form
  * gets the scale-shaped plan (≤ k rows per (group, map partition)
  * cross the exchange; no data-sized WindowExec sort, no rank column
  * materialized) without calling [[graft.ops.Scale.topKPerGroup]].
  *
  * Conservative by construction — the rewrite fires only when:
  *  - the Window computes exactly ONE expression: `row_number()` with
  *    the standard (UNBOUNDED PRECEDING, CURRENT ROW) row frame;
  *  - the filter's rank conjuncts are `rn <= k` / `rn < k` / `rn = 1`
  *    (either literal side) with an integral literal, k ≥ 1;
  *  - the projection above either DROPS the rank column (the common
  *    `.filter(...).drop("rn")` shape) or KEEPS/derives from it — in
  *    the latter case the operator EMITS the per-group rank under the
  *    original alias's exprId (its final-stage selection counter is
  *    exactly row_number), so rank-consuming projections resolve
  *    unchanged (r8 verdict #5);
  *  - partition keys are deterministic and not raw floats (byte
  *    equality vs sort equality — the [[TopKPerGroup]] scaladoc
  *    contract), the order spec is non-empty and deterministic, and
  *    the remaining filter conjuncts don't reference rn.
  *
  * Semantics note: under a TOTAL (tie-broken) order — the registry-wide
  * oracle discipline — the rewrite is exactly result-preserving; under
  * ties, row_number itself is already nondeterministic in a distributed
  * engine, and the rewrite picks an equally valid selection. The full
  * 330+-query oracle sweep runs with this rule ACTIVE, which is the
  * bit-exactness proof. Kill switch: `spark.graft.rewrite.topK=false`.
  *
  * If Spark's own InferWindowGroupLimit has already bounded the window
  * input (Spark 3.5+'s partial answer to this pattern — it limits rows
  * per group but still pays the reduce-side WindowExec sort and rank
  * projection), the redundant [[WindowGroupLimit]] below the rewritten
  * operator is stripped.
  */
case class TopKRewrite(spark: SparkSession) extends Rule[LogicalPlan]
    with PredicateHelper {

  val ConfKey = "spark.graft.rewrite.topK"

  private def intLit(e: Expression): Option[Long] = e match {
    case Literal(v: Int, IntegerType)  => Some(v.toLong)
    case Literal(v: Long, LongType)    => Some(v)
    case Literal(v: Short, ShortType)  => Some(v.toLong)
    case Literal(v: Byte, ByteType)    => Some(v.toLong)
    case _                             => None
  }

  /** The single row_number alias of an eligible Window, if any. */
  private def rowNumberAlias(w: Window): Option[Alias] = w.windowExpressions match {
    case Seq(a @ Alias(WindowExpression(_: RowNumber,
        WindowSpecDefinition(_, _,
          SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _)) =>
      Some(a)
    case _ => None
  }

  /** k implied by one conjunct on the rank attribute, if recognizable.
    * Vacuous LOWER bounds (`rn >= 1`, from BETWEEN 1 AND k) contribute
    * Long.MaxValue so min() ignores them; a plan left with ONLY vacuous
    * bounds fails the k ≤ Int.MaxValue gate and stays un-rewritten.
    */
  private def boundFromConjunct(c: Expression, rn: Attribute): Option[Long] = c match {
    case LessThanOrEqual(a: Attribute, l) if a.semanticEquals(rn) => intLit(l)
    case LessThan(a: Attribute, l) if a.semanticEquals(rn)        => intLit(l).map(_ - 1)
    case GreaterThanOrEqual(l, a: Attribute) if a.semanticEquals(rn) => intLit(l)
    case GreaterThan(l, a: Attribute) if a.semanticEquals(rn)     => intLit(l).map(_ - 1)
    case EqualTo(a: Attribute, l) if a.semanticEquals(rn)         => intLit(l).filter(_ == 1L)
    case EqualTo(l, a: Attribute) if a.semanticEquals(rn)         => intLit(l).filter(_ == 1L)
    // row_number is always >= 1: these constrain nothing when the
    // literal is <= 1 (and block the rewrite otherwise)
    case GreaterThanOrEqual(a: Attribute, l) if a.semanticEquals(rn) =>
      intLit(l).filter(_ <= 1L).map(_ => Long.MaxValue)
    case LessThanOrEqual(l, a: Attribute) if a.semanticEquals(rn) =>
      intLit(l).filter(_ <= 1L).map(_ => Long.MaxValue)
    case GreaterThan(a: Attribute, l) if a.semanticEquals(rn) =>
      intLit(l).filter(_ <= 0L).map(_ => Long.MaxValue)
    case LessThan(l, a: Attribute) if a.semanticEquals(rn) =>
      intLit(l).filter(_ <= 0L).map(_ => Long.MaxValue)
    case _                                                        => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (spark.conf.getOption(ConfKey).contains("false")) return plan
    // pass 1: the projected shape — when the projection drops the rank,
    // the operator skips rank emission entirely
    val p1 = plan.transformUp {
      case p @ Project(projList, Filter(cond, w: Window)) =>
        rewrite(projList, cond, w).getOrElse(p)
    }
    // pass 2: the bare `Filter(rn <= k, Window)` shape (no projection
    // above — the filter output IS the result): the rank is part of the
    // output by construction, so rewrite with the emitted rank. Run as a
    // second pass so pass 1's projected sites keep their drop-rank
    // optimization (a bottom-up bare-Filter case would hijack them).
    p1.transformUp {
      case f @ Filter(cond, w: Window) =>
        rewrite(w.output.map(a => a: org.apache.spark.sql.catalyst.expressions.NamedExpression),
          cond, w).getOrElse(f)
    }
  }

  private def rewrite(
      projList: Seq[org.apache.spark.sql.catalyst.expressions.NamedExpression],
      cond: Expression,
      w: Window): Option[LogicalPlan] = {
    rowNumberAlias(w).flatMap { alias =>
      val rn = alias.toAttribute
      val conjuncts = splitConjunctivePredicates(cond)
      val (rnParts, rest) = conjuncts.partition(_.references.contains(rn))
      val bounds = rnParts.map(boundFromConjunct(_, rn))
      val groupOk = w.partitionSpec.nonEmpty && w.partitionSpec.forall { e =>
        e.deterministic && (e.dataType match {
          case FloatType | DoubleType => false
          case _                      => true
        })
      }
      val orderOk = w.orderSpec.nonEmpty && w.orderSpec.forall(_.child.deterministic)
      // r8 verdict #5: a projection that KEEPS the rank no longer blocks
      // the rewrite — the operator emits the per-group rank under the
      // original alias's exprId, so rank-consuming projections resolve
      // unchanged (the final stage's selection counter IS row_number)
      val keepsRank = projList.exists(_.references.contains(rn))
      val allowed = w.child.outputSet ++
        org.apache.spark.sql.catalyst.expressions.AttributeSet(rn :: Nil)
      val shapeOk = rnParts.nonEmpty && bounds.forall(_.isDefined) &&
        groupOk && orderOk &&
        projList.forall(e => e.deterministic && e.references.subsetOf(allowed)) &&
        rest.forall(_.references.subsetOf(w.child.outputSet))
      if (!shapeOk) None
      else {
        val k = bounds.flatten.min
        if (k < 1L || k > Int.MaxValue.toLong) None
        else {
          // a WindowGroupLimit Spark already inferred below the window is
          // redundant once the bounded operator takes over
          val base = w.child match {
            case wgl: WindowGroupLimit if wgl.limit >= k.toInt &&
                wgl.partitionSpec == w.partitionSpec &&
                wgl.orderSpec == w.orderSpec => wgl.child
            case c => c
          }
          val topk = TopKPerGroup(w.partitionSpec, w.orderSpec, k.toInt, base,
            rankAttr = if (keepsRank) Some(rn) else None)
          val filtered =
            if (rest.isEmpty) topk
            else Filter(rest.reduce(And), topk)
          Some(Project(projList, filtered))
        }
      }
    }
  }
}
