package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Dense-vector kernels over `array<float>` columns (SURVEY.md §2.7 F5,
  * §2.9 D3/D4), as native Catalyst expressions rather than Scala UDFs.
  *
  * Why an Expression and not `zip_with`/`aggregate` HOFs or a UDF: the HOF
  * formulation allocates a lambda frame per element and the UDF route
  * deserializes the whole array to `Seq[Float]` per row. Both fall out of
  * WholeStageCodegen. These expressions instead generate a call to a static
  * JIT-friendly loop over the columnar `ArrayData`, so a k-NN scan stays
  * inside the fused codegen stage — the difference is ~10× on the
  * 100×2000-vector bench query.
  *
  * Numeric contract (t2): all accumulation is double, sequential
  * left-to-right, matching DuckDB's `list_dot_product(a::DOUBLE[], …)`
  * evaluation order, so results agree bit-for-bit before the defensive
  * ROUND(…, 4) both sides apply.
  */
object VectorOps {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def l2Norm(a: ArrayData): Double = {
    var s = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) { val x = a.getFloat(i).toDouble; s += x * x; i += 1 }
    math.sqrt(s)
  }

  /** splitmix64 — public-domain mixer (Steele et al., JDK SplittableRandom). */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Signed-random-projection bucket (Charikar's SimHash for vectors): bit j
    * is the sign of the dot product with a deterministic ±1 hyperplane drawn
    * from splitmix64(j, d). No stored projection matrix — the hyperplane is
    * recomputed on the fly, so the operator ships no broadcast state and two
    * clusters always agree on bucket ids.
    */
  def srpBits(a: ArrayData, bits: Int, seed: Long): Long = {
    val n = a.numElements()
    var bucket = 0L
    var j = 0
    while (j < bits) {
      var s = 0.0
      var d = 0
      while (d < n) {
        val sign = if ((mix(seed + j.toLong * 8191L + d) & 1L) == 1L) 1.0 else -1.0
        s += a.getFloat(d).toDouble * sign
        d += 1
      }
      if (s > 0) bucket |= (1L << j)
      j += 1
    }
    bucket
  }
}

trait FloatArrayInputs extends Expression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val bad = children.map(_.dataType).filterNot {
      case ArrayType(FloatType, _) => true
      case _                       => false
    }
    if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${prettyName} expects array<float> inputs, got ${bad.mkString(", ")}")
  }
}

case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with FloatArrayInputs {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.cosine($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with FloatArrayInputs {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class L2Norm(child: Expression)
    extends UnaryExpression with FloatArrayInputs {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2_norm"
  override protected def nullSafeEval(a: Any): Any =
    VectorOps.l2Norm(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VectorOps.l2Norm($a)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** LSH bucket id for approximate-NN: `bits` signed random projections.
  * Distinct `seed`s give independent hash tables (multi-probe recall).
  */
case class SrpBucket(child: Expression, bits: Int, seed: Long)
    extends UnaryExpression with FloatArrayInputs {
  require(bits >= 1 && bits <= 63, s"srp bits must be in [1, 63], got $bits")
  override def dataType: DataType = LongType
  override def prettyName: String = "srp_bucket"
  override protected def nullSafeEval(a: Any): Any =
    VectorOps.srpBits(a.asInstanceOf[ArrayData], bits, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VectorOps.srpBits($a, $bits, ${seed}L)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Column-API surface for the vector kernels. */
object vectors {
  def cosineSim(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))
  def dotProduct(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))
  def l2Norm(a: Column): Column =
    Bridge.column(L2Norm(Bridge.expression(a)))
  def srpBucket(a: Column, bits: Int, seed: Long = 0L): Column =
    Bridge.column(SrpBucket(Bridge.expression(a), bits, seed))
}
