package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, Join, LocalLimit, LocalRelation, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.plans.{LeftAnti, LeftSemi}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Registry-wide scale lint for pair-blow-up joins: a Join whose BOTH
  * sides reach the SAME source scan at row level — without crossing an
  * Aggregate (unique keys by construction), a Limit/LocalRelation
  * (bounded), or the capGroups `_gn` window (explicitly df-capped) —
  * is the df² shape that detonates on one hot key at 100 TB (the
  * round-5 shingle-miner verdict). The audit walks every registered
  * query's OPTIMIZED plan (distinct/dropDuplicates have collapsed to
  * Aggregate by then) and reports the uncapped self-joins; the
  * ScaleSpec twin asserts the result equals the curated allowlist, so
  * a new uncapped self-join cannot land without a conscious exemption.
  */
object SelfJoinAudit {

  final case class Result(name: String, uncapped: Int, err: Option[String])

  /** Source scans reachable from `p` at unbounded row-level cardinality:
    * stops at Aggregate / Limit / LocalRelation / the capGroups marker
    * window (an alias named `_gn` — cardinality is bounded by the
    * subsequent df filter).
    */
  private def rowLevelScans(p: LogicalPlan): Set[String] = p match {
    case _: Aggregate | _: GlobalLimit | _: LocalLimit | _: LocalRelation => Set.empty
    case w: Window if w.windowExpressions.exists(_.name == "_gn") => Set.empty
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString).toSet
      case other => Set(other.toString)
    }
    case other => other.children.flatMap(rowLevelScans).toSet
  }

  /** True when both sides of the join reach the same source scan at
    * unbounded row-level cardinality. Semi/anti joins emit at most one
    * row per probe-side row — no pair blow-up is possible, whatever
    * the key distribution — so they never flag.
    */
  def isUncapped(j: Join): Boolean =
    j.joinType != LeftSemi && j.joinType != LeftAnti &&
      rowLevelScans(j.left).intersect(rowLevelScans(j.right)).nonEmpty

  def audit(spark: SparkSession, sfDir: String): Seq[Result] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      try {
        var uncapped = 0
        fn(spark, sfDir).queryExecution.optimizedPlan.foreach {
          case j: Join if isUncapped(j) => uncapped += 1
          case _ => ()
        }
        Result(name, uncapped, None)
      } catch { case e: Throwable => Result(name, 0, Some(String.valueOf(e.getMessage))) }
    }
}
