package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window}

/** Dev-only: registry-wide TopKPerGroup ADOPTION sweep (r7-verdict #7).
  * For every registered query, walk the OPTIMIZED plan (rule active)
  * and report (a) TopKPerGroup nodes adopted, (b) row_number windows
  * that survive WITH a literal rank bound in a filter above them — the
  * sites [[graft.plans.TopKRewrite]] conservatively skipped.
  *
  * SWEEP RESULT (sf0.001, round 8): 39 TopKPerGroup nodes adopted
  * across 24 queries; 22 queries kept a literal-bounded row_number
  * window because the rank column is part of the query OUTPUT and the
  * rule's drop-the-rank precondition refused.
  *
  * SWEEP RESULT (sf0.001, round 9, rank-EMITTING rewrite per r8
  * verdict #5): **61 TopKPerGroup nodes across 38 queries** — the
  * operator now emits the per-group rank under the original alias's
  * exprId, so the 22 rank-keeping sites route too (full 373-query
  * oracle sweep re-verified bit-exact with the extended rule active).
  * Exactly TWO literal-bounded rank windows survive, both in queries
  * that rank the same pairs under TWO DIFFERENT orders and filter on
  * the DISJUNCTION (`rf <= 3 OR rt <= 3`): embed_matryoshka and
  * embed_sign_hamming — a union of two top-ks, outside any single
  * top-k operator's contract, and both already carry Spark's
  * InferWindowGroupLimit bound. Disposition: correctly not routed.
  *
  * The other two shapes from the r7 verdict list never reach this
  * audit because their bounds are COLUMNS, not literals: the capGroups
  * `_gn` df-cap and quota_enforce's 80-point admission compare rank to
  * per-group counts/budgets — data-dependent k, outside the operator's
  * contract (and WGL cannot bound them either; capGroups' own hashed
  * bucketing is the scale control there).
  */
object DevTopkSweep {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def rankBoundSites(plan: LogicalPlan): Int = {
      var n = 0
      plan.foreach {
        case Filter(cond, w: Window) =>
          val rnAttrs: Seq[Attribute] = w.windowExpressions.collect {
            case a @ Alias(WindowExpression(_: RowNumber, _), _) => a.toAttribute
          }
          def isLit(e: org.apache.spark.sql.catalyst.expressions.Expression) =
            e.isInstanceOf[Literal]
          val bounded = rnAttrs.exists { rn =>
            cond.exists {
              case LessThanOrEqual(a: Attribute, l) => a.semanticEquals(rn) && isLit(l)
              case LessThan(a: Attribute, l)        => a.semanticEquals(rn) && isLit(l)
              case GreaterThanOrEqual(l, a: Attribute) => a.semanticEquals(rn) && isLit(l)
              case GreaterThan(l, a: Attribute)     => a.semanticEquals(rn) && isLit(l)
              case EqualTo(a: Attribute, l)         => a.semanticEquals(rn) && isLit(l)
              case EqualTo(l, a: Attribute)         => a.semanticEquals(rn) && isLit(l)
              case _ => false
            }
          }
          if (bounded) n += 1
        case _ => ()
      }
      n
    }

    var adoptedQ = 0; var adoptedN = 0; var skipped = Seq.empty[(String, Int)]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val opt = fn(spark, dir).queryExecution.optimizedPlan
        val nTopk = opt.collect { case t: graft.plans.TopKPerGroup => t }.size
        val nSkip = rankBoundSites(opt)
        if (nTopk > 0) { adoptedQ += 1; adoptedN += nTopk }
        if (nSkip > 0) skipped :+= (name -> nSkip)
      } catch { case e: Throwable =>
        println(s"[topksweep] $name PLAN ERROR: ${e.getMessage}")
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    println(s"[topksweep] adopted: $adoptedN TopKPerGroup nodes across $adoptedQ queries")
    if (skipped.isEmpty)
      println("[topksweep] zero literal-bounded row_number windows survive the rule")
    else skipped.foreach { case (n, c) =>
      println(s"[topksweep] SKIPPED-SITE $n: $c literal-bounded row_number window(s)")
    }
    spark.stop()
  }
}
