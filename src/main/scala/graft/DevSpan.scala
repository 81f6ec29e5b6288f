package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: stage-level timing probe for the span-dedup path. Records
  * the round-4 finding that shaped ops/Text.gramPositionIndex: HOF
  * lambdas run INTERPRETED, so hashing inside transform() under the
  * single-partition parquet scan cost ~4 s at sf0.1, while the
  * exploded per-row form keeps the codegen'd Md5Hash60 in the
  * whole-stage span (~0.4 s same stage). Run to re-measure after any
  * change to the gram-index shape.
  */
object DevSpan {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[devspan] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.t(spark, dir, "documents")
      .select(col("doc_id"), graft.ops.Text.words(col("text")).as("w"))
    time("split only")(docs.agg(sum(expr("size(w)"))).collect())
    val idx = graft.ops.Text.gramPositionIndex(docs, "doc_id", "w", 5)
    time("gramPositionIndex cold")(idx.count())
    time("gramPositionIndex warm")(idx.count())
    for (rep <- 1 to 2)
      time(s"dedup_max_span full $rep") {
        spark.catalog.clearCache()
        graft.queries.Dedup.dedupMaxSpan.fn(spark, dir).count()
      }
    spark.stop()
  }
}
