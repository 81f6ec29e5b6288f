package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler for graph_triangles (not part of the driver
  * contract): times each stage of the degree-oriented wedge closure to
  * aim optimization at the actual bottleneck.
  */
object DevTriangles {
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
      println(f"[tri] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val li = Tables.t(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    time("raw distinct")(li.count())
    val edges = li.as("x").join(li.as("y"), "o")
      .filter(col("x.p") < col("y.p"))
      .select(col("x.p").as("src"), col("y.p").as("dst"))
    time("pair join")(edges.count())
    val und = edges
      .select(least(col("src"), col("dst")).as("lo"), greatest(col("src"), col("dst")).as("hi"))
      .distinct().persist()
    time("edges distinct")(und.count())
    val deg = und.select(col("lo").as("v")).union(und.select(col("hi").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    val withDeg = und
      .join(deg.select(col("v").as("lo"), col("d").as("dlo")), "lo")
      .join(deg.select(col("v").as("hi"), col("d").as("dhi")), "hi")
    val oriented = withDeg.select(
      when(col("dlo") < col("dhi") ||
        (col("dlo") === col("dhi") && col("lo") < col("hi")),
        struct(col("lo").as("u"), col("hi").as("w"), col("dhi").as("dw")))
        .otherwise(struct(col("hi").as("u"), col("lo").as("w"), col("dlo").as("dw")))
        .as("e"))
      .select(col("e.u").as("u"), col("e.w").as("w"), col("e.dw").as("dw"))
      .persist()
    time("orient (deg joins)")(oriented.count())
    val x = oriented.select(col("u"), col("w").as("b"), col("dw").as("db"))
    val y = oriented.select(col("u"), col("w").as("c"), col("dw").as("dc"))
    val wedges = x.join(y, "u")
      .filter(col("db") < col("dc") || (col("db") === col("dc") && col("b") < col("c")))
      .select(col("u").as("a"), col("b"), col("c"))
    time("wedges")(wedges.count())
    val tri = wedges.join(
      oriented.select(col("u").as("b"), col("w").as("c")), Seq("b", "c"), "left_semi")
    time("closure semi-join")(tri.count())
    val counts = tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("n_tri"))
    time("explode+count+top")(counts.orderBy(desc("n_tri"), asc("v")).limit(100).collect())
    spark.stop()
  }
}
