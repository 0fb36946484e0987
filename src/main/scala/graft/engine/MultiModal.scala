package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns (SURVEY.md §2.9 D8 + north-star): media payloads as
  * opaque `binary` columns with typed metadata, plus the decode /
  * feature-extract / frame-sample plumbing a training-data pipeline needs.
  *
  * No binary fixtures ship with the corpus, so media rows are derived
  * DETERMINISTICALLY from `documents` (payload = utf-8 bytes of `text`);
  * everything downstream of that derivation — schema, partitioning, batch
  * iteration, explode shapes — is the real plumbing. The one stub is
  * [[decodeFeatures]]'s kernel: where production would run an image/audio
  * codec (no such libs in this container), it computes a byte-nibble
  * histogram — deterministic, testable, and with the same
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

  /** Derive a media table from documents: payload + per-kind metadata. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"),
      struct(
        (col("n_chars") % 640).cast("int").as("width"),
        (col("n_chars") % 480).cast("int").as("height"),
        (col("n_chars") * 40).as("duration_ms")).as("meta"))

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
    */
  def frameSample(media: DataFrame, frameBytes: Int = 100, maxFrames: Int = 4): DataFrame =
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

  /** Payload/metadata stats per kind — proves binary length semantics and
    * the metadata struct against DuckDB's BLOB handling.
    */
  val kindStats = Q(
    "mm_kind_stats",
    """SELECT (['image', 'audio', 'video'])[CAST(doc_id % 3 + 1 AS INT)] AS kind,
      |  COUNT(*) AS n,
      |  CAST(SUM(octet_length(text::BLOB)) AS BIGINT) AS total_bytes,
      |  CAST(MAX(n_chars % 640) AS INTEGER) AS max_width
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    MultiModal.mediaFromDocuments(Tables.documents(s, dir))
      .groupBy("kind")
      .agg(
        count(lit(1)).as("n"),
        sum(length(col("payload"))).as("total_bytes"),
        max(col("meta.width")).as("max_width"))
      .orderBy("kind")
  }

  /** Frame-sampling shape: (media_id, frame_idx, byte_offset) rows. */
  val frameSample = Q(
    "mm_frame_sample",
    """SELECT doc_id AS media_id,
      |  CAST(f AS INTEGER) AS frame_idx,
      |  CAST(f * 100 AS INTEGER) AS byte_offset
      |FROM documents
      |CROSS JOIN (SELECT unnest(range(0, 4)) AS f) t
      |WHERE doc_id % 3 = 2
      |  AND f <= (octet_length(text::BLOB) - 1) // 100
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
    * hash-checked, not just row-counted. Payloads reduce to 16 doubles
    * before the only shuffle.
    */
  val featureProfile = Q(
    "mm_feature_profile",
    """WITH d AS (
      |  SELECT doc_id, (['image', 'audio', 'video'])[CAST(doc_id % 3 + 1 AS INT)] AS kind,
      |    text, GREATEST(1, length(text)) AS n
      |  FROM documents),
      |nib AS (
      |  SELECT doc_id, kind, n,
      |    ascii(substr(text, CAST(unnest(range(1, length(text) + 1)) AS INT), 1)) & 15 AS bin
      |  FROM d),
      |w AS (
      |  SELECT doc_id, kind, bin, COUNT(*) / CAST(ANY_VALUE(n) AS DOUBLE) AS wt
      |  FROM nib GROUP BY doc_id, kind, bin),
      |grid AS (
      |  SELECT d.doc_id, d.kind, b.bin, COALESCE(w.wt, 0) AS wt
      |  FROM d CROSS JOIN (SELECT unnest(range(0, 16)) AS bin) b
      |  LEFT JOIN w ON w.doc_id = d.doc_id AND w.bin = b.bin)
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
    * the 16-byte md5 computed in the scan projection, so multi-MB payloads
    * never shuffle and never reach the aggregation. (The oracle hashes the
    * text the payload was derived from — byte-identical utf-8.)
    */
  val dedupPayload = Q(
    "mm_dedup_payload",
    """SELECT (['image', 'audio', 'video'])[CAST(doc_id % 3 + 1 AS INT)] AS kind,
      |  md5(text) AS payload_hash,
      |  MIN(doc_id) AS keeper_id, COUNT(*) AS n_copies
      |FROM documents GROUP BY 1, 2 ORDER BY keeper_id""".stripMargin) { (s, dir) =>
    MultiModal.mediaFromDocuments(Tables.documents(s, dir))
      .groupBy(col("kind"), md5(col("payload")).as("payload_hash"))
      .agg(min("media_id").as("keeper_id"), count(lit(1)).as("n_copies"))
      .orderBy("keeper_id")
  }

  /** Resize/thumbnail profile through [[MultiModal.resizePayload]]: crop
    * every payload to its first 64 bytes and profile the result per kind
    * (bytes kept + distinct-thumb count — the dedup rate AFTER lossy
    * reduction). DuckDB has no BLOB substring, so the oracle slices the
    * VARCHAR then casts; byte == char slicing holds because the corpus is
    * pure ASCII (octet_length == length verified over the fixtures), the
    * same construction mm_kind_stats' octet_length already relies on.
    * Map-only before a 3-key agg; payload bytes never shuffle.
    */
  val resizeProfile = Q(
    "mm_resize_profile",
    """SELECT (['image', 'audio', 'video'])[CAST(doc_id % 3 + 1 AS INT)] AS kind,
      |  COUNT(*) AS n,
      |  CAST(SUM(octet_length(substring(text, 1, 64)::BLOB)) AS BIGINT) AS resized_bytes,
      |  CAST(COUNT(DISTINCT md5(substring(text, 1, 64))) AS BIGINT) AS n_distinct_thumbs
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    MultiModal.resizePayload(
        MultiModal.mediaFromDocuments(Tables.documents(s, dir)), 64)
      .groupBy("kind")
      .agg(
        count(lit(1)).as("n"),
        sum(length(col("payload"))).as("resized_bytes"),
        countDistinct(md5(col("payload"))).as("n_distinct_thumbs"))
      .orderBy("kind")
  }

  val all: Seq[Q] = Seq(kindStats, frameSample, featureProfile, dedupPayload,
    resizeProfile)
}
