package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: time graph_triangles' co-purchase triangle count at one
  * tiled rung with a chosen wedge-closure block count — the harness
  * that fills SCALE.md's triangles ×128 cell (the one-pass plan's
  * 84 GB wedge shuffle exceeds this box's scratch; the blocked plan
  * caps live shuffle at ~1/blocks of it).
  * Args: sfDir blocks [shufflePartitions]
  */
object DevTriRung {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val blocks = args(1).toInt
    val parts = if (args.length > 2) args(2) else "128"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = Tables.t(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val edges = li.as("x").join(li.as("y"), "o")
      .filter(col("x.p") < col("y.p"))
      .select(col("x.p").as("src"), col("y.p").as("dst"))
    val t0 = System.nanoTime()
    val top = graft.ops.Graph.triangles(edges, blocks = blocks)
      .orderBy(desc("n_tri"), asc("v")).limit(5).collect()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"TRIRUNG dir=$sfDir blocks=$blocks parts=$parts sec=$sec%.1f " +
      s"top=${top.map(r => s"${r.getLong(0)}:${r.getLong(1)}").mkString(",")}")
    spark.stop()
  }
}
