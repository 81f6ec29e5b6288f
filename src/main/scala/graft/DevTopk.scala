package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: measured A/B for the bounded TopKPerGroup operator vs the
  * row_number window form it replaces (and that TopKRewrite rewrites),
  * on a synthetic 5M-row / 50k-group / k=3 selection — the shape where
  * the window form must shuffle and SORT all 5M rows to keep 150k.
  * Run: sbt "runMain graft.DevTopk". Findings recorded in the adopting
  * commit and the build notes.
  */
object DevTopk {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[devtopk] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    graft.plans.TopKPerGroup.ensureStrategy(spark)
    // deterministic synthetic: payload column to make shuffled rows wide
    val df = spark.range(5000000L)
      .select((col("id") % 50000L).as("g"), col("id").as("v"),
        concat_ws("-", lit("payload"), col("id"), col("id") * 7).as("p"))
      .persist()
    println(s"[devtopk] rows=${df.count()}")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("p"))
    for (rep <- 1 to 2) {
      time(s"window row_number form rep$rep") {
        println("[devtopk]   n=" + df.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3).drop("rn").count())
      }
      time(s"TopKPerGroup operator rep$rep") {
        println("[devtopk]   n=" + graft.ops.Scale.topKPerGroup(
          df, Seq("g"), Seq(("v", false), ("p", true)), 3).count())
      }
      time(s"TopKRewrite (rule-driven) rep$rep") {
        spark.experimental.extraOptimizations =
          Seq(graft.plans.TopKRewrite(spark))
        try println("[devtopk]   n=" + df.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3).drop("rn").count())
        finally spark.experimental.extraOptimizations = Nil
      }
    }
    df.unpersist()
    spark.stop()
  }
}
