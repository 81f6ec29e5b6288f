package graft.ops

import graft.expressions.DotProductDouble
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity-search primitives generic over any (id, ARRAY<DOUBLE>)
  * relation — the library surface for a user's own embedding tables.
  */
object Ann {

  /** Fused native dot product (codegen'd, no intermediate array).
    * Registers `graft_dot` on the active and default sessions so
    * standalone use (per EXAMPLES.md) resolves at analysis. If you
    * analyze on a session that is neither (e.g. a bare `newSession()`),
    * call [[graft.expressions.DotProductDouble.register]] on it first —
    * or build the session with `GraftExtensions`.
    */
  def dot(a: Column, b: Column): Column = {
    (org.apache.spark.sql.SparkSession.getActiveSession.toSeq ++
      org.apache.spark.sql.SparkSession.getDefaultSession.toSeq)
      .foreach(DotProductDouble.register)
    call_function(DotProductDouble.fnName, a, b)
  }

  /** Exact cosine top-k: for each query row, the `k` nearest corpus rows
    * by cosine similarity, self-matches excluded. Output: (q_id, c_id,
    * rnk, sim). Ranking is deterministic cross-engine: round(,6) on the
    * similarity with an id tie-break.
    *
    * O(|queries|·|corpus|) by design — the exact baseline/verifier to
    * run against a pruned candidate set (IVF cell, LSH bucket), never
    * all-pairs at corpus scale.
    */
  def cosineTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      idCol: String = "id",
      vecCol: String = "vec"): DataFrame = {
    DotProductDouble.register(corpus.sparkSession)
    def normed(df: DataFrame, prefix: String): DataFrame =
      df.select(col(idCol).as(s"${prefix}_id"), col(vecCol).as(s"${prefix}e"))
        .withColumn(s"${prefix}n", sqrt(dot(col(s"${prefix}e"), col(s"${prefix}e"))))
    val q = normed(queries, "q")
    val c = normed(corpus, "c")
    // bounded native top-k BEFORE the exchange: the scored pair stream is
    // |q|x|corpus|-sized, and the row_number window form would shuffle and
    // SORT all of it per q_id — TopKPerGroup lets at most k rows per
    // (q_id, map partition) cross the wire; the rank window then runs over
    // <= k rows per group and reuses the operator's clustered partitioning
    // (no second shuffle). Ordering key is the identical rounded-sim +
    // c_id total order, so the selected rows are bit-identical.
    val scored = q.join(c, col("q_id") =!= col("c_id"))
      .withColumn("sim", dot(col("qe"), col("ce")) / (col("qn") * col("cn")))
      .withColumn("_simr", round(col("sim"), 6))
    val sel = Scale.topKPerGroup(scored, Seq("q_id"),
      Seq(("_simr", false), ("c_id", true)), k)
    val w = Window.partitionBy("q_id").orderBy(col("_simr").desc, col("c_id").asc)
    sel.withColumn("rnk", row_number().over(w).cast("bigint"))
      .select(col("q_id"), col("c_id"), col("rnk"), col("sim"))
  }

  /** Hard-negative mining for contrastive training: for each query row,
    * the `k` most cosine-similar corpus rows whose `groupCol` DIFFERS
    * from the query's — the near-misses a retrieval model must learn to
    * reject. Same deterministic ranking contract as [[cosineTopK]]
    * (round(,6) + id tie-break); output adds both group labels.
    *
    * Exact O(|queries|·|corpus|) scoring by design — at corpus scale,
    * feed it a pruned candidate relation (an IVF probe set or LSH
    * bucket union) as `corpus`, exactly like the exact-top-k verifier.
    */
  def hardNegatives(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      idCol: String = "id",
      vecCol: String = "vec",
      groupCol: String = "grp"): DataFrame = {
    DotProductDouble.register(corpus.sparkSession)
    def normed(df: DataFrame, prefix: String): DataFrame =
      df.select(col(idCol).as(s"${prefix}_id"), col(groupCol).as(s"${prefix}_grp"),
          col(vecCol).as(s"${prefix}e"))
        .withColumn(s"${prefix}n", sqrt(dot(col(s"${prefix}e"), col(s"${prefix}e"))))
    val q = normed(queries, "q")
    val c = normed(corpus, "c")
    // same bounded-selection shape as [[cosineTopK]] — see the note there
    val scored = q.join(c, col("q_grp") =!= col("c_grp"))
      .withColumn("sim", dot(col("qe"), col("ce")) / (col("qn") * col("cn")))
      .withColumn("_simr", round(col("sim"), 6))
    val sel = Scale.topKPerGroup(scored, Seq("q_id"),
      Seq(("_simr", false), ("c_id", true)), k)
    val w = Window.partitionBy("q_id").orderBy(col("_simr").desc, col("c_id").asc)
    sel.withColumn("rnk", row_number().over(w).cast("bigint"))
      .select(col("q_id"), col("q_grp"), col("c_id"), col("c_grp"), col("rnk"), col("sim"))
  }
}
