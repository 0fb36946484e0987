package graft

import org.apache.spark.sql.SparkSession

/** One-call library entry point: everything a user needs to query a corpus
  * root through either API.
  *
  * {{{
  * val spark = GraftSession.open(SparkSession.builder().getOrCreate(),
  *                               "/data/corpus")
  * spark.sql("""SELECT d.doc_id, cosine_sim(e.embedding, e.embedding) AS s
  *              FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id""")
  * graft.engine.LlmOps.dedupExact.build(spark, "/data/corpus")   // Column API
  * }}}
  *
  * `open` is idempotent and safe on a session the caller built with its own
  * confs: it only (1) applies the runtime-settable corpus confs
  * ([[graft.engine.Tables.prepare]] — UTC session time, the events
  * timestamp-encoding read shims), (2) registers every corpus table as a
  * temp view, and
  * (3) installs the codegen'd vector SQL functions. Sessions built with
  * `spark.sql.extensions=graft.functions.GraftExtensions` already have the
  * functions; re-registering is a no-op.
  */
object GraftSession {
  def open(spark: SparkSession, dir: String): SparkSession = {
    engine.Tables.prepare(spark)
    engine.SqlOps.registerViews(spark, dir)
    functions.GraftFunctions.register(spark)
    spark
  }
}
