package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{Identifier, ProcedureCatalog}
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.Scan
import org.apache.spark.sql.types.{DataTypes, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The SQL face of the store REFRESH half — Spark 4's DSv2 stored
  * procedures (`ProcedureCatalog` + the `CALL` statement), so an ad-hoc
  * SQL user can land an append batch into a standing store without
  * touching Scala: register the batch as a temp view (pure SQL), then
  *
  * {{{
  *   CALL graft.refresh_postings('<store_path>', 'batch_view')
  *   CALL graft.refresh_rollup('<store_path>', 'batch_view')
  *   CALL graft.refresh_bloom('<store_path>', 'batch_view')
  *   CALL graft.ingest_postings_segment('<store_path>', 'batch_view', '7')
  * }}}
  *
  * [[graft.GraftSession.openStores]] wires the catalog under the name
  * `graft` (`spark.sql.catalog.graft`), completing the interactive story:
  * the serve half was already SQL (`graft_postings` et al.); with this
  * the maintain half is too. Every procedure routes through the SAME
  * [[Sinks]] refresh entrypoints the programmatic and streaming paths
  * use, so SQL-landed batches inherit every guard those paths carry —
  * including the loud fresh-checkpoint rejection when
  * `ingest_postings_segment` is handed a batch id at/below the store's
  * fold watermark (spec-pinned misuse). Procedures execute DRIVER-side at
  * CALL time (they are maintenance operations, not expressions), return
  * no result rows, and are declared non-deterministic so nothing ever
  * caches or re-plans around them.
  */
class GraftProcedureCatalog extends ProcedureCatalog {
  private var catalogName = "graft"

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name
  override def name(): String = catalogName

  /** A driver-side void procedure over string parameters. */
  private def proc(procName: String, desc: String, params: Seq[String])(
      run: (SparkSession, IndexedSeq[String]) => Unit): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = procName
      override def description(): String = desc
      override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
        override def name(): String = procName
        override def description(): String = desc
        override def parameters(): Array[ProcedureParameter] =
          params.map(p => ProcedureParameter.in(p, DataTypes.StringType).build()).toArray
        override def isDeterministic: Boolean = false
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val args = params.indices.map { i =>
            require(!input.isNullAt(i), s"$procName: parameter '${params(i)}' is null")
            input.getUTF8String(i).toString
          }
          run(SparkSession.active, args)
          java.util.Collections.emptyIterator()
        }
      }
    }

  private val procedures: Map[String, UnboundProcedure] = Seq(
    proc("refresh_postings",
      "append a batch view's documents into a standing posting store " +
        "(Sinks.refreshPostings — next free segment id above the watermark)",
      Seq("store_path", "batch_view")) { (s, a) =>
      Sinks.refreshPostings(s, a(0), s.table(a(1)))
    },
    proc("ingest_postings_segment",
      "land a batch view as an explicit posting segment id " +
        "(Sinks.ingestPostingsSegment — replays rewrite in place; a fresh-" +
        "checkpoint id at/below the fold watermark is rejected loudly)",
      Seq("store_path", "batch_view", "batch_id")) { (s, a) =>
      val id = a(2).toLongOption.getOrElse(throw new IllegalArgumentException(
        s"ingest_postings_segment: batch_id must be an integer, got '${a(2)}'"))
      Sinks.ingestPostingsSegment(s, a(0), s.table(a(1)), id)
    },
    proc("refresh_rollup",
      "fold a batch view's events into a standing daily rollup store " +
        "(Sinks.refreshDailyRollup — touched days rewritten, others untouched)",
      Seq("store_path", "batch_view")) { (s, a) =>
      Sinks.refreshDailyRollup(s, a(0), s.table(a(1)))
    },
    proc("refresh_bloom",
      "OR-merge a batch view's items (column 'ng') into a standing Bloom " +
        "decontamination store (Sinks.refreshBloomFilter — byte-identical " +
        "to a rebuild over the union)",
      Seq("store_path", "batch_view")) { (s, a) =>
      Sinks.refreshBloomFilter(s, a(0), s.table(a(1)), "ng")
    }
  ).map(p => p.name() -> p).toMap

  override def loadProcedure(ident: Identifier): UnboundProcedure = {
    require(ident.namespace().isEmpty,
      s"unknown procedure namespace ${ident.namespace().mkString(".")}")
    procedures.getOrElse(ident.name(), throw new IllegalArgumentException(
      s"unknown graft procedure '${ident.name()}' — available: " +
        procedures.keys.toSeq.sorted.mkString(", ")))
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] = {
    require(namespace.isEmpty, "graft procedures live in the root namespace")
    procedures.keys.toSeq.sorted.map(Identifier.of(Array.empty, _)).toArray
  }
}
