package graft.sources

import org.apache.spark.sql.SparkSession

/** Build-once registry for PERSISTED index stores (posting store, PQ ANN
  * index). The registered `log_indexed_search` / `llm_ann_ivfpq_indexed`
  * queries exercise the real engine lifecycle — build the index ONE time,
  * then answer every query from the standing store without touching the
  * corpus — instead of re-deriving the index inside each query plan the
  * way the self-contained `log_inverted_search` / `llm_ann_ivfpq`
  * formulations do.
  *
  * Stores live under the JVM temp dir, keyed by (layout version, data
  * dir): the first query against a corpus builds; every later query —
  * including a benchmark's timed run after its warm run — reads the
  * standing store, which is exactly the steady state worth measuring. The
  * layout VERSION is part of the path so a writer-format change can never
  * probe a stale store; the completion marker is the store's LAST-written
  * component (meta / codebook `_SUCCESS`), so a crashed partial build is
  * rebuilt, never trusted.
  */
object Stores {

  private val VERSION = "v2" // v2: posting store gained docstats + (n_docs, avgdl) meta
  private val memo = scala.collection.concurrent.TrieMap.empty[String, String]

  private def storeRoot(dataDir: String, kind: String): String = {
    val safe = dataDir.replaceAll("[^A-Za-z0-9.]+", "_")
    s"${sys.props("java.io.tmpdir")}/graft_stores/$VERSION/$safe/$kind"
  }

  private def buildOnce(key: String, doneMarker: String)(build: => Unit): String =
    memo.getOrElseUpdate(key, {
      if (!new java.io.File(doneMarker).exists()) build
      key
    })

  /** Path of the standing positional posting store for `dataDir`'s
    * documents table, building it via [[Sinks.writePostings]] on first use.
    */
  def postingStore(spark: SparkSession, dataDir: String): String = {
    val path = storeRoot(dataDir, "postings_store")
    // meta is written after the postings directory → valid completion marker
    buildOnce(path, s"$path/meta/_SUCCESS") {
      Sinks.writePostings(graft.engine.Tables.documents(spark, dataDir), path)
    }
  }

  /** Path of the standing PQ ANN index (codebook + encoded corpus) for
    * `dataDir`'s embeddings table, training + encoding on first use via
    * the same `pqTrainEncode` the self-contained query runs.
    */
  def pqIndex(spark: SparkSession, dataDir: String): String = {
    val path = storeRoot(dataDir, "pq_index")
    // codes is written after codebook (writePqIndex order) → marker
    buildOnce(path, s"$path/codes/_SUCCESS") {
      val (cb, codes) = graft.engine.LlmOps.pqTrainEncode(spark, dataDir)
      Sinks.writePqIndex(cb, codes, path)
    }
  }
}
