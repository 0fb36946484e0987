package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for the graft vector kernels, so the engine is
  * usable as a library from `spark.sql(...)` and not only the Column API:
  *
  *   - at session build:
  *     `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  *   - on a live session (the driver builds sessions we don't control):
  *     `GraftFunctions.register(spark)`
  *
  * Both routes install the same codegen'd Catalyst expressions from
  * [[VectorExprs]]; there is no separate UDF fallback, so the SQL spelling
  * keeps whole-stage codegen exactly like the Column spelling.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.specs.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftFunctions {

  /** (name, info, builder) triples for every SQL-exposed graft function. */
  val specs: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("cosine_sim",
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two array<float> vectors"),
      args => { require(args.size == 2, "cosine_sim takes 2 arguments")
        CosineSimilarity(args(0), args(1)) }),
    ("dot_product",
      info("dot_product", "dot_product(a, b) - dot product of two array<float> vectors"),
      args => { require(args.size == 2, "dot_product takes 2 arguments")
        DotProduct(args(0), args(1)) }),
    ("l2_norm",
      info("l2_norm", "l2_norm(a) - Euclidean norm of an array<float> vector"),
      args => { require(args.size == 1, "l2_norm takes 1 argument")
        L2Norm(args(0)) }),
    ("srp_bucket",
      info("srp_bucket",
        "srp_bucket(a, bits, seed) - signed-random-projection LSH bucket of an array<float> vector"),
      args => { require(args.size == 3, "srp_bucket takes 3 arguments")
        SrpBucket(args(0),
          args(1).eval().asInstanceOf[Number].intValue(),
          args(2).eval().asInstanceOf[Number].longValue()) }))

  private def info(name: String, usage: String): ExpressionInfo =
    // Full (non-deprecated) constructor. Beware the 3-arg form: it is
    // (className, db, name) — passing usage there silently records
    // db=<name>, name=<usage>, corrupting DESCRIBE FUNCTION output.
    new ExpressionInfo("graft.functions.VectorExprs", null, name, usage,
      "", "", "", "", "", "", "built-in")

  /** Install the functions on an already-built session (idempotent). */
  def register(spark: SparkSession): SparkSession = {
    specs.foreach { case (name, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), info, builder)
    }
    spark
  }
}
