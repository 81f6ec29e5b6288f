package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler for the clean-triple phash pair miner (r13):
  * times each stage of the production construction in isolation so the
  * optimization targets the measured cost, not the assumed one.
  */
object DevPhash {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[phash] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    Tables.t(spark, sfDir, "documents").count() // warmup

    (1 to 2).foreach { pass =>
      println(s"--- pass $pass ---")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      val hh = time("hh build (md5 scan)")(
        graft.queries.TextOps.phashHashes(spark, sfDir).persist())
      time("hh materialize")(hh.count())
      val grp = time("grp capGroups build")(
        graft.ops.Scale.capGroups(hh, "ahash", 128L).persist())
      time("grp materialize")(grp.count())
      val bands = graft.queries.TextOps.phashBandsOf(hh)
      time("bands (distinct+explode) count")(bands.count())
      val capped = graft.ops.Scale.capGroups(bands, "bk", 128L).persist()
      time("capped materialize")(capped.count())
      val rp = capped.select(col("bk"), col("ahash").as("ha"))
        .join(capped.select(col("bk"), col("ahash").as("hb")), "bk")
        .filter(col("ha") < col("hb"))
        .select("ha", "hb").distinct()
        .withColumn("hamming", expr("CAST(bit_count(ha ^ hb) AS BIGINT)"))
        .filter(col("hamming") <= 3)
      val nrp = time("rp self-join+distinct")(rp.count())
      println(s"[phash] rp pairs = $nrp")
      val t0 = System.nanoTime()
      val full = graft.queries.TextOps.multimodalPhashPairs.fn(spark, sfDir).count()
      println(f"[phash] FULL pairs query               ${(System.nanoTime() - t0) / 1e9}%8.3f s ($full rows)")
    }
    spark.stop()
  }
}
