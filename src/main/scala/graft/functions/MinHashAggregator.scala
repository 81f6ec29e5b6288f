package graft.functions

import graft.queries.Dedup
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregate (the Aggregator[IN,BUF,OUT] surface, SURVEY.md
  * Table B "UDF/UDAF/UDTF"): folds pre-hashed shingle values into a
  * 16-permutation MinHash signature. Register with
  * `spark.udf.register("minhash_sig", udaf(MinHashAggregator))` for SQL, or
  * use as a TypedColumn over KeyValueGroupedDataset. The permutation
  * constants are Dedup.perms, so signatures are identical to the
  * column-expression pipeline in dedup_minhash_lsh.
  */
object MinHashAggregator extends Aggregator[Long, Array[Long], Seq[Long]] {
  private val P = 2147483647L
  private val perms = Dedup.perms.toArray

  override def zero: Array[Long] = Array.fill(perms.length)(Long.MaxValue)

  override def reduce(buf: Array[Long], hm: Long): Array[Long] = {
    var i = 0
    while (i < perms.length) {
      val (a, b) = perms(i)
      val h = (a * hm + b) % P
      if (h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < x.length) { if (y(i) < x(i)) x(i) = y(i); i += 1 }
    x
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
