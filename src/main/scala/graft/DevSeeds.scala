package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler for the seed-graph family (sssp/closeness):
  * the similarity graph is ≤60 vertices, so the per-query seconds must
  * be coming from scans or scheduling, not graph volume — measure which.
  */
object DevSeeds {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    Tables.t(spark, sfDir, "lineitem").count() // warm the reader

    val ui = Tables.events(spark, sfDir).filter(col("user_id") < 60)
      .select(col("user_id"), concat_ws(":", col("event_type"),
        expr("(ts_us DIV 3600000000) % 24")).as("item"))
      .distinct()
    time("userItems count")(println("  rows=" + ui.count()))
    time("userItems count warm")(ui.count())
    val sizes = ui.groupBy("user_id").agg(count(lit(1)).as("sz"))
    val l = ui.select(col("user_id").as("ua"), col("item"))
    val r = ui.select(col("user_id").as("ub"), col("item"))
    val ed = l.join(r, "item").filter(col("ua") < col("ub"))
      .groupBy("ua", "ub").agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("user_id").as("ua"), col("sz").as("na")), "ua")
      .join(sizes.select(col("user_id").as("ub"), col("sz").as("nb")), "ub")
      .filter(expr("10000 * inter DIV (na + nb - inter) >= 3000"))
    time("simEdgesDist count")(println("  edges=" + ed.count()))
    time("simEdgesDist count warm")(ed.count())
    for (p <- 1 to 2) {
      time(s"graph_sssp_seeds full pass $p") {
        graft.queries.Graphs.ssspSeeds.fn(spark, sfDir).collect()
      }
      time(s"graph_closeness_seeds full pass $p") {
        graft.queries.Graphs.closenessSeeds.fn(spark, sfDir).collect()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
