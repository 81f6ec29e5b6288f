package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.Join

/** Dev-only: print the join condition of every uncapped self-join the
  * registry lint flags, so curated exemptions are grounded in the
  * actual flagged join, not guesswork.
  */
object DevLintDump {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = args.drop(1).toSet
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (names.isEmpty || names.contains(name)) {
        try {
          val df = fn(spark, sfDir)
          spark.catalog.clearCache()
          df.queryExecution.optimizedPlan.foreach {
            case j: Join if SelfJoinAudit.isUncapped(j) =>
              println(s"$name :: ${j.joinType} :: ${j.condition.map(_.sql).getOrElse("<none>")}")
            case _ => ()
          }
        } catch { case e: Throwable => println(s"$name :: ERR ${e.getMessage}") }
      }
    }
    spark.stop()
  }
}
