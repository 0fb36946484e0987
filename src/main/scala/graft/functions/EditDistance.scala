package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Bit-parallel Levenshtein distance — Myers' algorithm (G. Myers, "A
  * fast bit-vector algorithm for approximate string matching based on
  * dynamic programming", JACM 1999) with Hyyrö's block extension for
  * patterns longer than one machine word (H. Hyyrö, "A bit-vector
  * algorithm for computing Levenshtein and Damerau edit distances",
  * 2003). Public-knowledge algorithm; implementation written for this
  * engine.
  *
  * Why not the built-in: Spark's `levenshtein(a, b, threshold)` runs the
  * banded O(threshold·|a|) dynamic program per CELL; at the loose
  * thresholds a similarity floor like 0.3 implies (band ≈ 0.7·len) that
  * is close to the full O(len²) table. Myers computes the EXACT distance
  * in O(⌈m/64⌉·n) word operations — each 64-bit word step advances a
  * whole DP column — which is ~40× less work at the fixture's ~300-char
  * documents. The result is the exact classic Levenshtein distance
  * (spec-pinned equal to Spark's built-in across random strings spanning
  * the 64/128-bit block boundaries and non-ASCII code points), so the
  * DuckDB oracle is untouched.
  */
object EditDistance {

  private def codePoints(s: String): Array[Int] = {
    val out = new Array[Int](s.codePointCount(0, s.length))
    var i = 0
    var j = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      out(j) = cp
      j += 1
      i += Character.charCount(cp)
    }
    out
  }

  /** Exact Levenshtein distance of `sa`/`sb` over code points, or -1 once
    * the distance provably exceeds `limit` (the built-in's 3-arg
    * contract; `limit < 0` means unbounded). Early exit: the bottom-row
    * score moves by at most ±1 per text column, so once
    * `score − remaining > limit` no suffix can recover.
    */
  def distance(sa: UTF8String, sb: UTF8String, limit: Int): Int = {
    var a = codePoints(sa.toString)
    var b = codePoints(sb.toString)
    if (a.length > b.length) { val t = a; a = b; b = t }
    val m = a.length
    val n = b.length
    if (limit >= 0 && n - m > limit) return -1 // |Δlen| lower bound
    if (m == 0) return n
    val words = (m + 63) >>> 6
    // Peq[c] = bitmask of pattern positions holding code point c
    val peq = new java.util.HashMap[Integer, Array[Long]]()
    var i = 0
    while (i < m) {
      var arr = peq.get(a(i))
      if (arr == null) { arr = new Array[Long](words); peq.put(a(i), arr) }
      arr(i >>> 6) |= 1L << (i & 63)
      i += 1
    }
    val pv = Array.fill(words)(-1L)
    val mv = new Array[Long](words)
    val zeros = new Array[Long](words)
    val last = words - 1
    val scoreShift = (m - 1) & 63 // the D(m, ·) bit inside the last block
    var score = m
    var j = 0
    while (j < n) {
      val eqw = { val e = peq.get(b(j)); if (e == null) zeros else e }
      var hin = 1 // the D(0, j) = j boundary enters the lowest block as +1
      var k = 0
      while (k < words) {
        var eq = eqw(k)
        if (hin < 0) eq |= 1L
        val xh = (((eq & pv(k)) + pv(k)) ^ pv(k)) | eq
        var ph = mv(k) | ~(xh | pv(k))
        var mh = pv(k) & xh
        if (k == last) // bottom-row delta read at the pattern's last bit
          score += ((ph >>> scoreShift) & 1L).toInt - ((mh >>> scoreShift) & 1L).toInt
        val hout = ((ph >>> 63) & 1L).toInt - ((mh >>> 63) & 1L).toInt
        ph = ph << 1
        mh = mh << 1
        if (hin > 0) ph |= 1L
        if (hin < 0) mh |= 1L
        val xv = eq | mv(k)
        pv(k) = mh | ~(xv | ph)
        mv(k) = ph & xv
        hin = hout
        k += 1
      }
      if (limit >= 0 && score - (n - 1 - j) > limit) return -1
      j += 1
    }
    if (limit >= 0 && score > limit) -1 else score
  }
}

/** `EditDistance.distance` as a codegen'd Catalyst expression —
  * drop-in for `levenshtein(a, b, limit)` where the banded built-in is
  * the bottleneck (see [[graft.engine.TextOps.levenshteinPairs]]).
  */
case class LevenshteinMyers(first: Expression, second: Expression,
                            third: Expression)
  extends TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val got = children.map(_.dataType)
    if (got(0) == StringType && got(1) == StringType && got(2) == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (string, string, int), got ${got.mkString(", ")}")
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean =
    first.nullable || second.nullable || third.nullable
  override protected def nullSafeEval(a: Any, b: Any, l: Any): Any =
    EditDistance.distance(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String], l.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, l) =>
      s"graft.functions.EditDistance.distance($a, $b, $l)")
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): LevenshteinMyers =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object LevenshteinMyers {
  def apply(a: Column, b: Column, limit: Column): Column =
    Bridge.column(LevenshteinMyers(
      Bridge.expression(a), Bridge.expression(b), Bridge.expression(limit)))
}
