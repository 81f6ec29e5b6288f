package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: report every registered query whose analyzed plan contains a
  * GLOBAL window (empty partition spec) over an input that is NOT
  * provably small by the GlobalWindowGuard rules — the single-task
  * hazard the round-1 verdict flagged. Logic lives in [[WindowAudit]],
  * shared with WindowAuditSpec (the sbt-test enforcement).
  */
object DevWindowAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    WindowAudit.audit(spark, sfDir).foreach {
      case WindowAudit.Result(name, _, _, Some(err)) => println(s"AUDIT ERR $name: $err")
      case WindowAudit.Result(name, _, bad, _) if bad > 0 =>
        println(s"AUDIT BAD $name: $bad data-sized global windows")
      case WindowAudit.Result(name, small, _, _) if small > 0 =>
        println(s"AUDIT ok $name: $small provably-small global windows")
      case _ => ()
    }
    spark.stop()
  }
}
