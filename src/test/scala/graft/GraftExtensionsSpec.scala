package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.SparkSession

/** The SQL surface of the vector kernels: both registration routes
  * (extensions conf at build time, registry injection on a live session)
  * expose the same codegen'd expressions to `spark.sql`.
  */
class GraftExtensionsSpec extends SparkSpecBase {

  test("GraftSession.open: views + SQL functions usable in one call") {
    val s = GraftSession.open(spark, sfDir)
    val rows = s.sql(
      """SELECT d.doc_id, ROUND(cosine_sim(e.embedding, e.embedding), 4) AS self_sim
        |FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
        |WHERE d.doc_id < 5 ORDER BY d.doc_id""".stripMargin).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-6))
  }

  test("runtime registration exposes kernels to spark.sql") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT cosine_sim(a, a) AS cos_aa,
        |       dot_product(a, b) AS dot_ab,
        |       l2_norm(b) AS norm_b,
        |       srp_bucket(a, 4, 42L) AS bucket
        |FROM VALUES (array(cast(3.0 as float), cast(4.0 as float)),
        |             array(cast(1.0 as float), cast(0.0 as float))) AS t(a, b)
        |""".stripMargin).collect().head
    assert(math.abs(row.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(row.getDouble(1) - 3.0) < 1e-12)
    assert(math.abs(row.getDouble(2) - 1.0) < 1e-12)
    assert(row.getLong(3) >= 0L && row.getLong(3) < 16L)
  }

  test("extensions class installs the functions at session build") {
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val v = s2.sql(
        """SELECT l2_norm(array(cast(6.0 as float), cast(8.0 as float))) AS n"""
      ).collect().head.getDouble(0)
      assert(math.abs(v - 10.0) < 1e-12)
    } finally {
      // shared-JVM session: do not stop() — it would kill the SparkContext
      // under TestSpark.spark; just drop the extra session state.
      SparkSession.clearActiveSession()
      SparkSession.setActiveSession(TestSpark.spark)
    }
  }

  test("SQL spelling stays inside whole-stage codegen") {
    GraftFunctions.register(spark)
    val df = graft.engine.Tables.embeddings(spark, sfDir)
      .createOrReplaceTempView("emb_ext")
    val plan = spark.sql(
      "SELECT vec_id, l2_norm(embedding) AS n FROM emb_ext")
      .queryExecution.executedPlan.toString
    // the `*(n)` prefix marks operators fused into a WholeStageCodegen stage
    assert(plan.linesIterator.next().startsWith("*("), plan)
  }
}
