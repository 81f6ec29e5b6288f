package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, LocalLimit, LocalRelation, LogicalPlan, Window}

/** Dev-only: report every registered query whose analyzed plan contains a
  * GLOBAL window (empty partition spec) over an input that is NOT
  * provably small by the GlobalWindowGuard rules — the single-task
  * hazard the round-1 verdict flagged.
  */
object DevWindowAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def provablySmall(plan: LogicalPlan): Boolean = plan match {
      case _: Aggregate | _: GlobalLimit | _: LocalLimit | _: LocalRelation => true
      case other if other.children.size == 1 => provablySmall(other.children.head)
      case _ => false
    }
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        var globalSmall = 0; var globalBad = 0
        fn(spark, sfDir).queryExecution.analyzed.foreach {
          case w: Window if w.partitionSpec.isEmpty =>
            if (provablySmall(w.child)) globalSmall += 1 else globalBad += 1
          case _ => ()
        }
        if (globalBad > 0) println(s"AUDIT BAD $name: $globalBad data-sized global windows")
        else if (globalSmall > 0) println(s"AUDIT ok $name: $globalSmall provably-small global windows")
      } catch { case e: Throwable => println(s"AUDIT ERR $name: ${e.getMessage}") }
    }
    spark.stop()
  }
}
