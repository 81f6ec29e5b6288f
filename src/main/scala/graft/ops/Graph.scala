package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives for the dedup pipeline — generic over any
  * edge list, not bound to the testdata tables (the library surface a
  * user points at their own near-dup pair output).
  */
object Graph {

  /** Connected components by min-label propagation, iterated to the
    * fixpoint. Input: an edge list (two long-typed columns); edges are
    * treated as UNDIRECTED. Output: (`v`, `component`) where component =
    * the minimum vertex id reachable from `v` — the canonical "keep"
    * representative in a dedup clustering.
    *
    * Scale mechanics (the shape a 100 TB clustering job needs):
    *  - labels only ever decrease, so the exact decimal label sum is a
    *    strictly-decreasing fixpoint detector — one aggregate per round
    *    instead of a join-and-compare;
    *  - lineage is broken every round: RELIABLE checkpoints when
    *    `spark.graft.checkpointDir` is set (survives executor loss),
    *    executor-local otherwise;
    *  - `maxIters` is a runaway guard far above any real diameter;
    *    hitting it THROWS rather than returning unconverged labels.
    */
  def connectedComponents(
      edgeList: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst",
      maxIters: Int = 64): DataFrame = {
    val s = edgeList.sparkSession
    val ckDir = s.conf.getOption("spark.graft.checkpointDir")
    ckDir.foreach(s.sparkContext.setCheckpointDir)
    def break(df: DataFrame): DataFrame =
      if (ckDir.isDefined) df.checkpoint(true) else df.localCheckpoint(true)

    val fwd = edgeList.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val edges = fwd.union(fwd.select(col("dst"), col("src"))).persist()
    var labels = break(edges.select(col("src").as("v")).distinct()
      .withColumn("lbl", col("v")))
    // coalesce: an EMPTY edge list (no duplicates found) sums to null,
    // which would NPE the convergence compare — normalize to 0 so the
    // loop exits immediately and the empty labels relation returns
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(coalesce(sum(col("lbl").cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)"))).head.getDecimal(0)
    var prevSum = labelSum(labels)
    var changed = true
    var iter = 0
    while (changed && iter < maxIters) {
      val prop = edges.join(labels, col("src") === col("v"))
        .select(col("dst").as("v"), col("lbl"))
      val next = break(labels.union(prop).groupBy("v").agg(min("lbl").as("lbl")))
      val nextSum = labelSum(next)
      changed = nextSum.compareTo(prevSum) != 0
      prevSum = nextSum
      labels = next
      iter += 1
    }
    if (changed)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIters rounds — graph diameter exceeds guard")
    edges.unpersist()
    labels.select(col("v"), col("lbl").as("component"))
  }
}
