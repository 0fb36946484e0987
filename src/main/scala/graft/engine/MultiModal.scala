package graft.engine

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns (SURVEY.md §2.9 D8 + north-star): media payloads as
  * opaque `binary` columns with typed metadata, plus the decode /
  * feature-extract / frame-sample plumbing a training-data pipeline needs.
  *
  * No binary fixtures ship with the corpus, so the media table is derived
  * DETERMINISTICALLY from `documents` — but as GENUINE binary, not
  * text-cast bytes: each payload is a real format magic header (PNG
  * `\x89PNG\r\n\x1a\n`, RIFF/WAVE, MP4 `ftyp`) followed by 64 bytes of
  * md5-derived pseudorandom body, so payloads exercise the full 0–255
  * byte range, are not valid UTF-8, and would round-trip through any
  * BLOB-typed store. Both engines derive the identical bytes (Spark
  * `unhex(md5(...))` ≡ DuckDB `from_hex(md5(...))` — md5 hex is lowercase
  * on both), so the five `mm_*` oracles stay hash-green on actual
  * BinaryType data. Everything downstream of the derivation — schema,
  * partitioning, batch iteration, explode shapes — is the real plumbing.
  * The one stub is [[decodeFeatures]]'s kernel: where production would
  * run an image/audio codec (no such libs in this container), it computes
  * a byte-nibble histogram — deterministic, testable, and with the same
  * Iterator-per-partition batch shape a real decoder would use.
  *
  * Scale notes (100 TB of media): payloads never shuffle — every operator
  * here is a narrow map or a generator (explode) planned before any
  * exchange; aggregations first project payload down to scalars/features.
  * mapPartitions (not a per-row UDF) is deliberate: a real decoder
  * amortizes codec init once per partition, exactly this seam.
  */
object MultiModal {

  final case class Media(media_id: Long, kind: String, payload: Array[Byte],
                         width: Int, height: Int, duration_ms: Long)
  final case class MediaFeature(media_id: Long, kind: String, feature: Array[Double])

  /** Per-kind format magic, hex-encoded, indexed by doc_id % 3 (same order
    * as the kind array): PNG signature / RIFF+WAVE / MP4 ftyp box prefix. */
  val headerHex: Seq[String] = Seq(
    "89504e470d0a1a0a", // image: PNG signature
    "5249464657415645", // audio: "RIFF" + "WAVE"
    "0000001866747970") // video: ftyp box length+tag

  /** Body = 4 md5 chunks of the doc text salted by chunk index: 64 bytes
    * of full-range pseudorandom binary, identical in both engines. */
  private def bodyExpr(text: Column): Column =
    concat((0 until 4).map(i => unhex(md5(concat(text, lit(s":$i"))))): _*)

  /** Derive the media table from documents: genuine-binary payload
    * (magic header + md5 body) + per-kind typed metadata. */
  def mediaFromDocuments(docs: DataFrame): DataFrame = {
    val kindIdx = (col("doc_id") % 3 + 1).cast("int")
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")), kindIdx)
        .as("kind"),
      concat(
        unhex(element_at(array(headerHex.map(lit): _*), kindIdx)),
        bodyExpr(col("text"))).as("payload"),
      struct(
        (col("n_chars") % 640).cast("int").as("width"),
        (col("n_chars") % 480).cast("int").as("height"),
        (col("n_chars") * 40).as("duration_ms")).as("meta"))
  }

  /** The media table as a typed Dataset (the decode seam's input shape). */
  def mediaDataset(docs: DataFrame): Dataset[Media] = {
    val s = docs.sparkSession
    import s.implicits._
    mediaFromDocuments(docs).select(
      col("media_id"), col("kind"), col("payload"),
      col("meta.width").as("width"), col("meta.height").as("height"),
      col("meta.duration_ms").as("duration_ms")).as[Media]
  }

  /** Decode seam (STUB kernel, real batch plumbing): one partition-level
    * iterator pass, feature = 16-bin histogram of low nibbles, L1-normalized.
    * A production codec swaps in at the marked line only.
    */
  def decodeFeatures(media: Dataset[Media]): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // <- production: initialize codec once per partition here
      rows.map { m =>
        // <- production: codec.decode(m.payload) replaces this fake
        val bins = new Array[Double](16)
        m.payload.foreach(b => bins(b & 0x0f) += 1.0)
        val n = math.max(1.0, m.payload.length.toDouble)
        MediaFeature(m.media_id, m.kind, bins.map(_ / n))
      }
    }
  }

  /** Frame sampling: one row per sampled frame, offsets stride the payload.
    * A generator (posexplode) — not a shuffle — so it scales linearly.
    * Default stride 16 bytes against the 72-byte payloads (8-byte header +
    * 64-byte body) ⇒ up to 5 candidate frames, capped at `maxFrames`.
    */
  def frameSample(media: DataFrame, frameBytes: Int = 16, maxFrames: Int = 4): DataFrame =
    media
      .filter(col("kind") === "video")
      .select(col("media_id"),
        posexplode(slice(
          sequence(lit(0L), greatest(lit(0L),
            expr(s"(length(payload) - 1) div $frameBytes"))),
          1, maxFrames)).as(Seq("frame_idx", "chunk_no")))
      .select(col("media_id"), col("frame_idx"),
        (col("chunk_no") * frameBytes).as("byte_offset"))

  /** "Resize": keep the first `n` payload bytes (binary substring). */
  def resizePayload(media: DataFrame, n: Int): DataFrame =
    media.withColumn("payload", expr(s"substring(payload, 1, $n)"))
}

/** Oracle-checked registry entries for the multimodal plumbing. */
object MultiModalOps {

  /** Shared oracle-SQL media-derivation CTE — the DuckDB mirror of
    * [[MultiModal.mediaFromDocuments]], interpolated into every `mm_*`
    * oracle so the two derivations cannot desync (one source of truth,
    * same discipline as LlmOps' shinglePairCtes). `from_hex(md5(...))`
    * builds the identical bytes Spark's `unhex(md5(...))` builds. */
  private val mediaCte = {
    val hdrs = MultiModal.headerHex.map(h => s"'$h'").mkString(", ")
    // NOTE: this block is re-interpolated into query strings that apply
    // .stripMargin AGAIN, so no line may start (after whitespace) with `|`
    // — the BLOB-concat `||` operators must sit at end of line or a second
    // stripMargin eats one pipe and turns them into bitwise OR.
    s"""media AS (
       |  SELECT doc_id AS media_id,
       |    (['image', 'audio', 'video'])[CAST(doc_id % 3 + 1 AS INT)] AS kind,
       |    from_hex(([$hdrs])[CAST(doc_id % 3 + 1 AS INT)]) ||
       |      from_hex(md5(text || ':0')) || from_hex(md5(text || ':1')) ||
       |      from_hex(md5(text || ':2')) || from_hex(md5(text || ':3')) AS payload,
       |    CAST(n_chars % 640 AS INT) AS width
       |  FROM documents)""".stripMargin
  }

  /** Payload/metadata stats per kind — proves binary length semantics and
    * the metadata struct against DuckDB's BLOB handling (octet_length on
    * the derived BLOB, not on source text).
    */
  val kindStats = Q(
    "mm_kind_stats",
    s"""WITH $mediaCte
      |SELECT kind, COUNT(*) AS n,
      |  CAST(SUM(octet_length(payload)) AS BIGINT) AS total_bytes,
      |  CAST(MAX(width) AS INTEGER) AS max_width
      |FROM media GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    MultiModal.mediaFromDocuments(Tables.documents(s, dir))
      .groupBy("kind")
      .agg(
        count(lit(1)).as("n"),
        sum(length(col("payload"))).as("total_bytes"),
        max(col("meta.width")).as("max_width"))
      .orderBy("kind")
  }

  /** Frame-sampling shape: (media_id, frame_idx, byte_offset) rows over
    * the binary payloads (16-byte stride, ≤ 4 frames). */
  val frameSample = Q(
    "mm_frame_sample",
    s"""WITH $mediaCte
      |SELECT media_id,
      |  CAST(f AS INTEGER) AS frame_idx,
      |  CAST(f * 16 AS INTEGER) AS byte_offset
      |FROM media
      |CROSS JOIN (SELECT unnest(range(0, 4)) AS f) t
      |WHERE kind = 'video'
      |  AND f <= (octet_length(payload) - 1) // 16
      |ORDER BY media_id, frame_idx""".stripMargin) { (s, dir) =>
    MultiModal.frameSample(MultiModal.mediaFromDocuments(Tables.documents(s, dir)))
      .select(col("media_id"), col("frame_idx").cast("int").as("frame_idx"),
        col("byte_offset").cast("int").as("byte_offset"))
      .orderBy("media_id", "frame_idx")
  }

  /** Per-kind mean feature vector THROUGH the decode seam — the oracle
    * recomputes the stub kernel (low-nibble histogram over the payload
    * bytes, L1-normalized, zero bins included) in SQL, so the whole
    * mapPartitions path from typed Dataset to aggregated features is
    * hash-checked, not just row-counted. DuckDB reads byte i's low nibble
    * as hex char 2i of `hex(payload)` (no byte-indexing needed on BLOB);
    * the Spark side is the real `b & 0x0f` byte kernel. Payloads reduce
    * to 16 doubles before the only shuffle.
    */
  val featureProfile = Q(
    "mm_feature_profile",
    s"""WITH $mediaCte,
      |hx AS (
      |  SELECT media_id, kind, hex(payload) AS h, octet_length(payload) AS n
      |  FROM media),
      |nib AS (
      |  SELECT media_id, kind, n,
      |    strpos('0123456789ABCDEF',
      |      substr(h, CAST(unnest(range(1, n + 1)) AS INT) * 2, 1)) - 1 AS bin
      |  FROM hx),
      |w AS (
      |  SELECT media_id, kind, bin, COUNT(*) / CAST(ANY_VALUE(n) AS DOUBLE) AS wt
      |  FROM nib GROUP BY media_id, kind, bin),
      |grid AS (
      |  SELECT m.media_id, m.kind, b.bin, COALESCE(w.wt, 0) AS wt
      |  FROM media m CROSS JOIN (SELECT unnest(range(0, 16)) AS bin) b
      |  LEFT JOIN w ON w.media_id = m.media_id AND w.bin = b.bin)
      |SELECT kind, CAST(bin AS INTEGER) AS bin, ROUND(AVG(wt), 6) AS avg_wt
      |FROM grid GROUP BY kind, bin ORDER BY kind, bin""".stripMargin) { (s, dir) =>
    val feats = MultiModal.decodeFeatures(
      MultiModal.mediaDataset(Tables.documents(s, dir)))
    feats.toDF()
      .select(col("kind"), posexplode(col("feature")).as(Seq("bin", "wt")))
      .groupBy("kind", "bin")
      .agg(round(avg("wt"), 6).as("avg_wt"))
      .orderBy("kind", "bin")
  }

  /** Exact media dedup on the BINARY payload — same digest-shuffle design
    * as `llm_dedup_hash` but through the binary column: the dedup key is
    * a 16-byte digest computed in the scan projection, so multi-MB
    * payloads never shuffle and never reach the aggregation. The portable
    * digest is md5 of the HEX encoding (DuckDB's md5 is VARCHAR-only;
    * both engines hex uppercase, so the strings — and digests — match).
    */
  val dedupPayload = Q(
    "mm_dedup_payload",
    s"""WITH $mediaCte
      |SELECT kind, md5(hex(payload)) AS payload_hash,
      |  MIN(media_id) AS keeper_id, COUNT(*) AS n_copies
      |FROM media GROUP BY 1, 2 ORDER BY keeper_id""".stripMargin) { (s, dir) =>
    MultiModal.mediaFromDocuments(Tables.documents(s, dir))
      .groupBy(col("kind"), md5(hex(col("payload"))).as("payload_hash"))
      .agg(min("media_id").as("keeper_id"), count(lit(1)).as("n_copies"))
      .orderBy("keeper_id")
  }

  /** Resize/thumbnail profile through [[MultiModal.resizePayload]]: crop
    * every payload to its first 64 bytes (header + 56 body bytes) and
    * profile the result per kind (bytes kept + distinct-thumb count — the
    * dedup rate AFTER lossy reduction). DuckDB slices the BLOB in hex
    * space (`from_hex(substr(hex(payload), 1, 128))` — version-portable,
    * byte-exact); Spark substrings the binary directly. Map-only before a
    * 3-key agg; payload bytes never shuffle.
    */
  val resizeProfile = Q(
    "mm_resize_profile",
    s"""WITH $mediaCte,
      |r AS (SELECT kind, from_hex(substr(hex(payload), 1, 128)) AS thumb
      |      FROM media)
      |SELECT kind, COUNT(*) AS n,
      |  CAST(SUM(octet_length(thumb)) AS BIGINT) AS resized_bytes,
      |  CAST(COUNT(DISTINCT md5(hex(thumb))) AS BIGINT) AS n_distinct_thumbs
      |FROM r GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    MultiModal.resizePayload(
        MultiModal.mediaFromDocuments(Tables.documents(s, dir)), 64)
      .groupBy("kind")
      .agg(
        count(lit(1)).as("n"),
        sum(length(col("payload"))).as("resized_bytes"),
        countDistinct(md5(hex(col("payload")))).as("n_distinct_thumbs"))
      .orderBy("kind")
  }

  val all: Seq[Q] = Seq(kindStats, frameSample, featureProfile, dedupPayload,
    resizeProfile)
}
