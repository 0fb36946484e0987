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

  final case class DecodedMeta(media_id: Long, kind: String, status: String,
                               width: Option[Int], height: Option[Int],
                               sample_rate: Option[Int], channels: Option[Int],
                               brand: Option[String])

  /** Rows whose payload is deliberately CORRUPTED before decode — the
    * clean-error path every real media pipeline needs (a 100 TB crawl
    * always contains truncated/mislabeled files, and one throwing row
    * must not kill a 10⁶-row partition). Deterministic so the oracle can
    * assert exactly which rows error.
    */
  def isCorrupt(mediaId: Long): Boolean = mediaId % 37 == 0

  /** REAL decodable payloads for the decode seam: a minimal-but-VALID
    * PNG (signature + IHDR with correct CRC32 + IEND) whose IHDR carries
    * doc-derived width/height, a valid canonical WAVE header (RIFF +
    * fmt chunk, PCM) carrying doc-derived sample rate/channels, and an
    * MP4 `ftyp` box carrying the `isom` brand. Field values are pure
    * functions of (doc_id, n_chars), so the oracle asserts the DECODED
    * fields from the generation rule — the hash match then proves the
    * JDK decoders extracted exactly what the writer encoded (encoder and
    * decoder share no code: manual spec-offset byte packing vs
    * javax.imageio / AudioSystem).
    */
  def decodablePayload(kind: String, nChars: Long): Array[Byte] = {
    val bb = new java.io.ByteArrayOutputStream()
    def be32(v: Int): Unit =
      bb.write(Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte))
    def le32(v: Int): Unit =
      bb.write(Array(v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte))
    def le16(v: Int): Unit = bb.write(Array(v.toByte, (v >>> 8).toByte))
    def ascii(s: String): Unit = bb.write(s.getBytes("US-ASCII"))
    kind match {
      case "image" =>
        val w = imageWidth(nChars)
        val h = imageHeight(nChars)
        bb.write(Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a))
        val ihdr = new java.io.ByteArrayOutputStream()
        ihdr.write("IHDR".getBytes("US-ASCII"))
        Seq(w, h).foreach { v =>
          ihdr.write(Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte))
        }
        ihdr.write(Array[Byte](8, 2, 0, 0, 0)) // depth 8, truecolor, no interlace
        val body = ihdr.toByteArray
        be32(13); bb.write(body)
        val crc = new java.util.zip.CRC32(); crc.update(body)
        be32(crc.getValue.toInt)
        be32(0); ascii("IEND"); be32(0xAE426082) // fixed IEND CRC
      case "audio" =>
        val rate = audioSampleRate(nChars)
        val ch = audioChannels(nChars)
        val dataLen = 8
        ascii("RIFF"); le32(36 + dataLen); ascii("WAVE")
        ascii("fmt "); le32(16); le16(1); le16(ch); le32(rate)
        le32(rate * ch * 2); le16(ch * 2); le16(16) // byteRate, blockAlign, 16-bit
        ascii("data"); le32(dataLen); bb.write(new Array[Byte](dataLen))
      case _ =>
        be32(16); ascii("ftyp"); ascii("isom"); be32(0)
    }
    bb.toByteArray
  }

  /** The doc-derived field rules — shared by the payload writer and the
    * oracle SQL (spelled there in arithmetic), one definition per field. */
  def imageWidth(nChars: Long): Int = (nChars % 640 + 1).toInt
  def imageHeight(nChars: Long): Int = (nChars % 480 + 1).toInt
  def audioSampleRate(nChars: Long): Int = (8000 + (nChars % 8) * 1000).toInt
  def audioChannels(nChars: Long): Int = (nChars % 2 + 1).toInt

  /** The REAL decode seam: one mapPartitions pass that builds each row's
    * decodable payload (corrupting the deterministic [[isCorrupt]] rows at
    * the format-magic offset), then runs the JDK's OWN decoders on the
    * bytes — `javax.imageio` readers for PNG dimensions, `AudioSystem`'s
    * WAVE parser for the fmt chunk, a spec-offset `ftyp` parse for the MP4
    * brand. Decoder init happens once per partition (the iterator seam a
    * production codec swaps into); a row that fails to decode yields a
    * clean `status = "decode_error"` row with null fields — never an
    * exception out of the partition. Payload bytes exist only inside the
    * pass: the output is metadata-wide, so nothing binary shuffles.
    */
  def decodedMeta(docs: DataFrame): Dataset[DecodedMeta] = {
    val s = docs.sparkSession
    import s.implicits._
    val in = docs.select(col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        col("n_chars"))
      .as[(Long, String, Long)]
    in.mapPartitions { rows =>
      // <- production: initialize codecs once per partition here
      rows.map { case (id, kind, nChars) =>
        val payload = decodablePayload(kind, nChars)
        if (isCorrupt(id)) {
          // break the format magic: byte 0 for PNG/RIFF, the box tag for ftyp
          payload(if (kind == "video") 4 else 0) = 0x00
        }
        try {
          kind match {
            case "image" =>
              val iis = javax.imageio.ImageIO.createImageInputStream(
                new java.io.ByteArrayInputStream(payload))
              // close `iis` on EVERY exit — including the no-reader throw,
              // which is exactly the path each corrupt row takes (an
              // unclosed FileCacheImageInputStream pins an FD + a disk-
              // cache temp file per corrupt row until GC)
              try {
                val readers = javax.imageio.ImageIO.getImageReaders(iis)
                if (!readers.hasNext) throw new java.io.IOException("no reader")
                val r = readers.next()
                try {
                  r.setInput(iis)
                  DecodedMeta(id, kind, "ok", Some(r.getWidth(0)), Some(r.getHeight(0)),
                    None, None, None)
                } finally r.dispose()
              } finally iis.close()
            case "audio" =>
              val fmt = javax.sound.sampled.AudioSystem
                .getAudioFileFormat(new java.io.ByteArrayInputStream(payload))
                .getFormat
              DecodedMeta(id, kind, "ok", None, None,
                Some(fmt.getSampleRate.toInt), Some(fmt.getChannels), None)
            case _ =>
              val tag = new String(payload.slice(4, 8), "US-ASCII")
              if (payload.length < 12 || tag != "ftyp")
                throw new java.io.IOException(s"not an ftyp box: $tag")
              DecodedMeta(id, kind, "ok", None, None, None, None,
                Some(new String(payload.slice(8, 12), "US-ASCII")))
          }
        } catch {
          case scala.util.control.NonFatal(_) =>
            DecodedMeta(id, kind, "decode_error", None, None, None, None, None)
        }
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

  /** The REAL-decoder face of the seam ([[MultiModal.decodedMeta]]): the
    * payloads are valid minimal PNG / WAVE / ftyp bytes whose header
    * fields carry doc-derived values, the decode runs the JDK's OWN
    * parsers (javax.imageio, AudioSystem), and the oracle asserts the
    * decoded fields straight from the generation rule — hash parity
    * proves the independent decoders read back exactly what the
    * spec-offset writer encoded, including the deterministic corrupt rows
    * surfacing as clean `decode_error` rows with null fields (never an
    * exception). The other four mm_* queries keep the md5-body payloads
    * whose BYTES DuckDB can re-derive; this one's bytes live only inside
    * the partition pass, so the oracle checks the decode, not the blob.
    */
  val decodedMeta = Q(
    "mm_decoded_meta",
    """SELECT doc_id AS media_id,
      |  (['image', 'audio', 'video'])[CAST(doc_id % 3 + 1 AS INT)] AS kind,
      |  CASE WHEN doc_id % 37 = 0 THEN 'decode_error' ELSE 'ok' END AS status,
      |  CASE WHEN doc_id % 37 <> 0 AND doc_id % 3 = 0
      |       THEN CAST(n_chars % 640 + 1 AS INT) END AS width,
      |  CASE WHEN doc_id % 37 <> 0 AND doc_id % 3 = 0
      |       THEN CAST(n_chars % 480 + 1 AS INT) END AS height,
      |  CASE WHEN doc_id % 37 <> 0 AND doc_id % 3 = 1
      |       THEN CAST(8000 + (n_chars % 8) * 1000 AS INT) END AS sample_rate,
      |  CASE WHEN doc_id % 37 <> 0 AND doc_id % 3 = 1
      |       THEN CAST(n_chars % 2 + 1 AS INT) END AS channels,
      |  CASE WHEN doc_id % 37 <> 0 AND doc_id % 3 = 2
      |       THEN 'isom' END AS brand
      |FROM documents ORDER BY media_id""".stripMargin) { (s, dir) =>
    MultiModal.decodedMeta(Tables.documents(s, dir)).toDF().orderBy("media_id")
  }

  val all: Seq[Q] = Seq(kindStats, frameSample, featureProfile, dedupPayload,
    resizeProfile, decodedMeta)
}
