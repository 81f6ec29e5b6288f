package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler for the heavy queries (not part of the driver
  * contract).
  */
object DevProfile {
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
      println(f"[profile] $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    // warmup
    Tables.t(spark, sfDir, "documents").count()

    val docs = Tables.t(spark, sfDir, "documents")
    val w = docs.select(col("doc_id"), filter(split(lower(col("text")), " "), x => x =!= "").as("w"))
      .filter(size(col("w")) >= 3)
    val sh = w.select(col("doc_id"), explode(array_distinct(
      transform(sequence(lit(1), size(col("w")) - 2), i =>
        concat_ws(" ", element_at(col("w"), i), element_at(col("w"), i + 1),
          element_at(col("w"), i + 2))))).as("sh"))
    time("shingles count")(sh.count())
    time("shingles count again")(sh.count())
    val hm = sh.withColumn("hm",
      expr("CAST(conv(substr(md5(sh), 1, 15), 16, 10) AS BIGINT) % 2147483647"))
    time("md5 hash")(hm.count())
    val sigCols = DedupAccess.sigCols
    val sig = hm.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
    time("signatures (16 mins)")(sig.count())
    time("signatures again")(sig.count())
    val full = time("full minhash query")(
      graft.queries.Dedup.minhashLsh.fn(spark, sfDir).count())
    println(s"pairs=$full")

    time("full simhash")(graft.queries.Dedup.simhash.fn(spark, sfDir).count())
    time("full jaccard")(graft.queries.Dedup.ngramJaccard.fn(spark, sfDir).count())
    time("full influx_fanout")(graft.queries.Ingest.influxFanout.fn(spark, sfDir).count())
    time("influx synth only")(Tables.events(spark, sfDir).select(
      expr("concat(event_type, ' value=', CAST(value AS STRING))")).count())
    spark.stop()
  }
}

object DedupAccess {
  import org.apache.spark.sql.Column
  val P = 2147483647L
  def sigCols: Seq[Column] = graft.queries.Dedup.perms.zipWithIndex.map { case ((a, b), i) =>
    min(expr(s"($a * hm + $b) % $P")).as(s"m$i")
  }
}
