package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, functions}
import org.apache.spark.sql.expressions.UserDefinedFunction

/** A10 (UDAF surface): MinHash signature as a typed `Aggregator` — the
  * custom-aggregate path for state Spark's built-ins can't express as one
  * function. `reduce` folds one token into the running elementwise-min
  * signature, `merge` combines partial signatures from different
  * partitions (map-side combine works exactly like a built-in agg), so the
  * shuffle carries nHash longs per group instead of the token stream.
  *
  * Token hash: splitmix64 over (slot-salt, String.hashCode) — both fully
  * specified, so signatures are stable across JVMs and cluster layouts.
  */
class MinHashAgg(val nHash: Int) extends Aggregator[String, Array[Long], Seq[Long]] {

  def hashSlot(j: Int, tok: String): Long =
    VectorOps.mix(j.toLong * 1000003L + tok.hashCode.toLong)

  override def zero: Array[Long] = Array.fill(nHash)(Long.MaxValue)

  override def reduce(buf: Array[Long], tok: String): Array[Long] = {
    var j = 0
    while (j < nHash) {
      val h = hashSlot(j, tok)
      if (h < buf(j)) buf(j) = h
      j += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < nHash) { if (b(j) < a(j)) a(j) = b(j); j += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}

object MinHashAgg {
  /** Untyped-DataFrame form: `df.groupBy("doc_id").agg(minhash(col("tok")))`. */
  def udaf(nHash: Int = 16): UserDefinedFunction =
    functions.udaf(new MinHashAgg(nHash))

  /** Jaccard estimate from two signatures: fraction of agreeing slots. */
  def estimate(a: Seq[Long], b: Seq[Long]): Double =
    a.zip(b).count { case (x, y) => x == y }.toDouble / a.size
}
