package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, functions}
import org.apache.spark.sql.expressions.UserDefinedFunction

/** D4 (embedding redundancy, hot path): the full d×d co-moment set of the
  * RAW double dimensions as one typed `Aggregator` — the per-partition
  * Gram-accumulation form of `llm_embed_corr_pairs`. The previous
  * formulation expanded every vector into its own d(d−1)/2 pair structs
  * map-side (one Generate of 2016 structs per row, ~10M shuffle-input rows
  * at sf0.1) and fed 2016 built-in `corr` aggregates; this one folds each
  * vector into a flat `Array[Double]` buffer in place, so the scan does
  * d(d+1)/2 fused multiply-adds per row with no row fanout at all, and the
  * shuffle carries ONE 2145-double buffer per partition. All five corr
  * ingredients (n, Σxᵢ, Σxᵢxⱼ including the diagonal Σxᵢ²) come out of one
  * pass; the 2016 Pearson values are then a driver-side O(d²) loop over
  * the single result row — metadata in the k-means-centroid sense.
  *
  * Unlike [[PcaComomentAgg]] (exact integer co-moments for the PCA chain,
  * where downstream iteration amplifies jitter) this one keeps raw
  * doubles: Pearson correlation is scale-invariant and consumed once at
  * ROUND(…, 4), and the oracle's `corr(a.x, b.x)` is defined on the raw
  * values — quantizing here would change the measured statistic. Additive
  * double fold order differs from DuckDB's streaming corr by ~1e-12
  * relative (√n·ε on near-centered embedding dims — no catastrophic
  * cancellation because the means sit near 0), eight orders under the 4 dp
  * dump: the same measure-zero-midpoint argument `llm_kmeans` is green
  * under.
  *
  * Buffer layout (length 1 + d + d(d+1)/2): slot 0 = n, slots 1..d = Σxᵢ,
  * then the row-major upper triangle of Σxᵢxⱼ. `merge` is element-wise
  * add, so map-side combine works exactly like a built-in agg. At 100 TB
  * the plan is unchanged: corpus-linear scan, partitions × one buffer over
  * the wire, d² driver-side finish.
  *
  * Null contract: whole-null vectors must be filtered UPSTREAM (the
  * caller does — matching the oracle's unnest-of-NULL skip), and a null
  * ELEMENT inside a vector fails LOUDLY at the input encoder rather than
  * silently skewing n. Per-element-null corpora would need per-PAIR
  * counts (each pair sees a different n) — the one shape this flat
  * buffer deliberately does not model; clean such data upstream, as the
  * error message directs.
  */
class CorrComomentAgg(val d: Int) extends Aggregator[Seq[Double], Array[Double], Seq[Double]] {
  private val len = 1 + d + d * (d + 1) / 2

  override def zero: Array[Double] = new Array[Double](len)

  override def reduce(buf: Array[Double], x: Seq[Double]): Array[Double] = {
    // loud failure on a null/ragged vector: the exploded formulation
    // silently skipped nulls via explode-of-null; silently changing n here
    // would skew every co-moment
    require(x != null, "null embedding row reached CorrComomentAgg — filter null vectors upstream")
    require(x.length == d, s"embedding dimension ${x.length} != expected $d")
    val a = x.toArray
    buf(0) += 1.0
    var i = 0
    var k = 1 + d
    while (i < d) {
      val xi = a(i)
      buf(1 + i) += xi
      var j = i
      while (j < d) { buf(k) += xi * a(j); j += 1; k += 1 }
      i += 1
    }
    buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var k = 0
    while (k < len) { a(k) += b(k); k += 1 }
    a
  }

  override def finish(buf: Array[Double]): Seq[Double] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
}

object CorrComomentAgg {
  /** Untyped form: `df.agg(comoments(col("v")))` over an `array<double>`
    * column; one row out, layout documented above.
    */
  def udaf(d: Int): UserDefinedFunction = functions.udaf(new CorrComomentAgg(d))

  /** Pearson correlation of dims (i, j) from a [[CorrComomentAgg]] result
    * row — the one definition of the finish-side math, shared by the query
    * and its spec. Population/sample scaling cancels in the ratio.
    */
  def corrOf(m: Seq[Double], d: Int, i: Int, j: Int): Double = {
    def tri(i: Int, j: Int): Int = 1 + d + i * d - i * (i - 1) / 2 + (j - i)
    val n = m(0)
    val cov = m(tri(i, j)) - m(1 + i) * m(1 + j) / n
    val vi = m(tri(i, i)) - m(1 + i) * m(1 + i) / n
    val vj = m(tri(j, j)) - m(1 + j) * m(1 + j) / n
    cov / math.sqrt(vi * vj)
  }
}
