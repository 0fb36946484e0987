package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, functions}
import org.apache.spark.sql.expressions.UserDefinedFunction

/** D4 (PCA step 1, hot path): exact integer co-moments of the quantized
  * embedding dimensions as a typed `Aggregator` — replaces the per-vector
  * explode of d(d+1)/2 pair structs (10M+ shuffle-input rows at sf0.1) with
  * a single flat `Array[Long]` buffer that each vector folds into in-place.
  * The input is ALREADY quantized by a Catalyst expression
  * (`cast(round(x·10⁵) as long)`), so the integers this aggregator sums are
  * bit-identical to the ones the exploded formulation summed — the oracle
  * agreement story is unchanged; only the orchestration moved.
  *
  * Buffer layout (length 1 + d + d(d+1)/2): slot 0 = n, slots 1..d = Σqᵢ,
  * then the row-major upper triangle of Σqᵢqⱼ. `merge` is element-wise add,
  * so map-side combine works exactly like a built-in agg: each partition
  * ships ONE 2145-long array to the single reduce group, never vectors.
  * Overflow: |q| ≤ 5.3e4 ⇒ Σqᵢqⱼ ≈ 1.4e13 at sf0.1, 1.4e19 > Long.Max only
  * past ~3e9 vectors — the 100 TB form splits the global agg into per-shard
  * partials summed as DECIMAL(38,0), same plan shape.
  */
class PcaComomentAgg(val d: Int) extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
  private val len = 1 + d + d * (d + 1) / 2

  override def zero: Array[Long] = new Array[Long](len)

  override def reduce(buf: Array[Long], q: Seq[Long]): Array[Long] = {
    // explicit failure on a null vector: the old exploded formulation
    // silently skipped nulls via explode-of-null; silently changing n here
    // would skew every co-moment, so a null row must fail loudly instead
    require(q != null, "null embedding row reached PcaComomentAgg — filter null vectors upstream")
    require(q.length == d, s"embedding dimension ${q.length} != expected $d")
    val a = q.toArray
    buf(0) += 1L
    var i = 0
    var k = 1 + d
    while (i < d) {
      buf(1 + i) += a(i)
      val qi = a(i)
      var j = i
      while (j < d) { buf(k) += qi * a(j); j += 1; k += 1 }
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var k = 0
    while (k < len) { a(k) += b(k); k += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}

object PcaComomentAgg {
  /** Untyped form: `df.agg(comoments(col("q")))` over a quantized
    * `array<bigint>` column; one row out, layout documented above.
    */
  def udaf(d: Int = 64): UserDefinedFunction =
    functions.udaf(new PcaComomentAgg(d))
}
