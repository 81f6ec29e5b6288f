package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Context assembly for training pipelines — generic over any
  * (id, token-count) relation.
  */
object Pack {

  /** Greedy sequential bin assignment: rows (in `idCol` order) are packed
    * into `binTokens`-sized bins by cumulative token count. Adds a `bin`
    * column; bit-identical to a single global cumulative sum.
    *
    * The cumsum is a DISTRIBUTED prefix-sum, not a global window: rows
    * shard into contiguous id ranges (`idCol DIV shardSize`), the cumsum
    * window is partitioned per shard (parallel), and shard offsets come
    * from a second tiny window over per-shard TOTALS (N/shardSize rows —
    * the only place a global ordering survives).
    */
  def assignBins(
      df: DataFrame,
      idCol: String,
      nTokensCol: String,
      binTokens: Long,
      shardSize: Long = 4096L,
      keepStart: Boolean = false): DataFrame = {
    require(!keepStart || !df.columns.contains("start"),
      "assignBins(keepStart=true) emits a `start` column; input already has one")
    val d = df.withColumn("_shard", expr(s"$idCol DIV $shardSize"))
    val wIn = Window.partitionBy("_shard").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wSh = Window.orderBy("_shard").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = d.groupBy("_shard").agg(sum(nTokensCol).as("_shard_tot"))
      .withColumn("_off", coalesce(sum("_shard_tot").over(wSh), lit(0L)))
      .select(col("_shard").as("_o_shard"), col("_off"))
    val withStart = d.withColumn("_local_cum", sum(nTokensCol).over(wIn))
      .join(offsets, col("_shard") === col("_o_shard"))
      // global token offset the row STARTS at (exclusive prefix sum);
      // internal underscore name so a caller's own `start` column survives
      .withColumn("_start", expr(s"_local_cum + _off - $nTokensCol"))
      .withColumn("bin", expr(s"_start DIV $binTokens"))
      .drop("_shard", "_o_shard", "_local_cum", "_off")
    if (keepStart) withStart.withColumnRenamed("_start", "start")
    else withStart.drop("_start")
  }
}
