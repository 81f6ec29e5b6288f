package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed 32-bit SimHash: folds 60-bit feature hashes into per-bit ±1
  * counters and finishes with the sign vector packed into a long —
  * integer-for-integer identical to the 32 generated sum-expressions it
  * replaces (one aggregate's codegen instead of 32).
  */
object SimHashAggregator extends Aggregator[Long, Array[Long], Long] {

  override def zero: Array[Long] = new Array[Long](32)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    var b = 0
    while (b < 32) {
      buf(b) += (if (((h >> b) & 1L) == 1L) 1L else -1L)
      b += 1
    }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var b = 0
    while (b < 32) { x(b) += y(b); b += 1 }
    x
  }

  override def finish(buf: Array[Long]): Long = {
    var sig = 0L
    var b = 0
    while (b < 32) { if (buf(b) > 0) sig |= 1L << b; b += 1 }
    sig
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Long] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Long]()
}
