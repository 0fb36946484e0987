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
  * shuffle carries ONE 2209-double buffer per partition (the layout
  * below). All five corr
  * ingredients (n, Σxᵢ, Σxᵢxⱼ including the diagonal Σxᵢ²) come out of one
  * pass; the 2016 Pearson values are then a driver-side O(d²) loop over
  * the single result row — metadata in the k-means-centroid sense.
  *
  * Unlike [[PcaComomentAgg]] (exact integer co-moments for the PCA chain,
  * where downstream iteration amplifies jitter) this one keeps raw
  * doubles: Pearson correlation is scale-invariant and consumed once at
  * ROUND(…, 4), and the oracle's `corr(a.x, b.x)` is defined on the raw
  * values — quantizing here would change the measured statistic.
  *
  * Numerical stability: the co-moments are accumulated about a PIVOT —
  * each buffer's first row, subtracted inside `reduce` — so the finish
  * form Σ(x−p)(y−p') − Σ(x−p)Σ(y−p')/n never suffers the catastrophic
  * cancellation the textbook un-centered Σxy − ΣxΣy/n form hits when a
  * dimension's |mean| dominates its std (the un-pivoted form was only
  * safe on near-centered embeddings; an offset corpus could have broken
  * the 4-dp oracle parity). The pivot is within one row-spread of the
  * mean, so the accumulated sums stay near-centered REGARDLESS of the
  * corpus offset, bounding the relative error at ~√n·ε like Spark's own
  * updating co-moment — while keeping the single-pass flat-buffer plan.
  * Additive double fold order still differs from DuckDB's streaming corr
  * by ~1e-12 relative, eight orders under the 4 dp dump: the same
  * measure-zero-midpoint argument `llm_kmeans` is green under.
  *
  * Buffer layout (length 1 + 2d + d(d+1)/2): slot 0 = n, slots 1..d = the
  * pivot pᵢ (undefined while n = 0), slots d+1..2d = Σ(xᵢ−pᵢ), then the
  * row-major upper triangle of Σ(xᵢ−pᵢ)(xⱼ−pⱼ). `merge` translates the
  * smaller operand's co-moments to the other's pivot (an O(d²)
  * shift-of-origin identity, once per partition pair) and then adds
  * element-wise, so map-side combine still works exactly like a built-in
  * agg. At 100 TB the plan is unchanged: corpus-linear scan, partitions ×
  * one buffer over the wire, d² driver-side finish.
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
  private val len = 1 + 2 * d + d * (d + 1) / 2
  // slot offsets: n @ 0, pivot @ 1..d, centered sums @ d+1..2d, triangle after
  private val sOff = 1 + d
  private val tOff = 1 + 2 * d

  override def zero: Array[Double] = new Array[Double](len)

  override def reduce(buf: Array[Double], x: Seq[Double]): Array[Double] = {
    // loud failure on a null/ragged vector: the exploded formulation
    // silently skipped nulls via explode-of-null; silently changing n here
    // would skew every co-moment
    require(x != null, "null embedding row reached CorrComomentAgg — filter null vectors upstream")
    require(x.length == d, s"embedding dimension ${x.length} != expected $d")
    val a = x.toArray
    if (buf(0) == 0.0) {
      // this buffer's first row becomes its pivot: every later row of the
      // partition accumulates about it, keeping the sums near-centered no
      // matter where the corpus sits
      var i = 0
      while (i < d) { buf(1 + i) = a(i); i += 1 }
    }
    buf(0) += 1.0
    var i = 0
    var k = tOff
    while (i < d) {
      val xi = a(i) - buf(1 + i)
      buf(sOff + i) += xi
      var j = i
      while (j < d) { buf(k) += xi * (a(j) - buf(1 + j)); j += 1; k += 1 }
      i += 1
    }
    buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    if (b(0) == 0.0) return a
    if (a(0) == 0.0) return b
    // shift-of-origin: with δᵢ = pᵇᵢ − pᵃᵢ, b's moments about a's pivot are
    //   s'ᵢ  = sᵇᵢ + nᵇ·δᵢ
    //   S'ᵢⱼ = Sᵇᵢⱼ + δᵢ·sᵇⱼ + δⱼ·sᵇᵢ + nᵇ·δᵢ·δⱼ
    // (substitute x−pᵃ = (x−pᵇ) + δ and expand). Once per partition pair,
    // O(d²) — the scan itself never pays it.
    val nb = b(0)
    val delta = new Array[Double](d)
    var i = 0
    while (i < d) { delta(i) = b(1 + i) - a(1 + i); i += 1 }
    var k = tOff
    i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        a(k) += b(k) + delta(i) * b(sOff + j) + delta(j) * b(sOff + i) +
          nb * delta(i) * delta(j)
        j += 1; k += 1
      }
      i += 1
    }
    i = 0
    while (i < d) { a(sOff + i) += b(sOff + i) + nb * delta(i); i += 1 }
    a(0) += nb
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
    * and its spec. Population/sample scaling cancels in the ratio, and the
    * pivot cancels too: covariance of (x−p) equals covariance of x, so the
    * pivot slots are never read here.
    */
  def corrOf(m: Seq[Double], d: Int, i: Int, j: Int): Double = {
    def tri(i: Int, j: Int): Int = 1 + 2 * d + i * d - i * (i - 1) / 2 + (j - i)
    def s(i: Int): Double = m(1 + d + i)
    val n = m(0)
    val cov = m(tri(i, j)) - s(i) * s(j) / n
    val vi = m(tri(i, i)) - s(i) * s(i) / n
    val vj = m(tri(j, j)) - s(j) * s(j) / n
    cov / math.sqrt(vi * vj)
  }
}
