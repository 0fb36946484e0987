package graft

import graft.engine.MultiModal
import graft.functions.MinHashAgg
import graft.sources.LogSource
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Coverage for the remaining §2 surfaces: S3/S4 raw-log sources, the A10
  * UDAF (MinHash aggregator), and the D8 multimodal plumbing.
  */
class SourcesAndUdafSpec extends SparkSpecBase {
  import spark.implicits._

  test("S3: text log lines parse into ts/level/component/message") {
    val dir = java.nio.file.Files.createTempDirectory("graft-log").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/app.log"),
      """2024-01-01T10:00:00 INFO scheduler.pool: job 1 started
        |2024-01-01T10:00:05 ERROR executor-7: task lost
        |garbage line that does not match
        |""".stripMargin)
    val parsed = LogSource.readTextLog(spark, dir).collect()
      .map(r => (Option(r.getTimestamp(0)).map(_.toString).getOrElse(""), r.getString(1), r.getString(2)))
    assert(parsed.contains(("2024-01-01 10:00:00.0", "INFO", "scheduler.pool")))
    assert(parsed.contains(("2024-01-01 10:00:05.0", "ERROR", "executor-7")))
    // non-matching line survives with empty fields (schema-on-read, not dropped)
    assert(parsed.exists(_._2 == ""))
  }

  test("S4: json lines ingest with explicit schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/ev.jsonl"),
      """{"event_id": 1, "event_type": "click", "value": 2.5}
        |{"event_id": 2, "event_type": "error", "value": 0.5}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType)))
    val got = LogSource.readJsonLines(spark, dir, schema)
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, "click", 2.5), (2L, "error", 0.5)))
  }

  test("S-CSV: commas, embedded quotes, and nulls survive the write→read round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString
    val src = Seq(
      (1L, Some("plain")),
      (2L, Some("with,comma")),
      (3L, Some("with \"quotes\" inside")),
      (4L, None))
    src.toDF("id", "s").write.mode("overwrite").option("header", "true").csv(dir)
    val got = LogSource.readCsv(spark, dir,
        StructType(Seq(StructField("id", LongType), StructField("s", StringType))))
      .as[(Long, Option[String])].collect().sortBy(_._1).toSeq
    assert(got === src)
  }

  test("A10: minhash UDAF — identical token sets give identical signatures; merge ≡ single-pass") {
    val minhash = MinHashAgg.udaf(16)
    val toks = Seq(
      (1L, Seq("a", "b", "c", "d")),
      (2L, Seq("d", "c", "b", "a")),   // same set, different order
      (3L, Seq("w", "x", "y", "z")))
      .flatMap { case (id, ts) => ts.map(id -> _) }
    // 8-partition spread forces real partial/merge aggregation paths
    val sigs = toks.toDF("doc_id", "tok").repartition(8)
      .groupBy("doc_id").agg(minhash(col("tok")).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(sigs(1L) === sigs(2L))
    assert(sigs(1L) !== sigs(3L))
    assert(MinHashAgg.estimate(sigs(1L), sigs(2L)) === 1.0)
    assert(MinHashAgg.estimate(sigs(1L), sigs(3L)) < 0.5)
    // signature slot = brute-force min over token hashes
    val agg = new MinHashAgg(16)
    val expected = (0 until 16).map(j => Seq("a", "b", "c", "d").map(agg.hashSlot(j, _)).min)
    assert(sigs(1L) === expected)
  }

  test("D8: media derivation, decode-stub features, frame sampling") {
    val docs = graft.engine.Tables.documents(spark, sfDir)
    val media = MultiModal.mediaFromDocuments(docs)
    assert(media.schema("payload").dataType === BinaryType)
    // payload round-trips the source text bytes
    val one = media.orderBy("media_id").select("media_id", "payload").first()
    val srcText = docs.orderBy("doc_id").select("text").first().getString(0)
    assert(new String(one.getAs[Array[Byte]]("payload"), "UTF-8") === srcText)

    val feats = MultiModal.decodeFeatures(media.select(
        col("media_id"), col("kind"), col("payload"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("meta.duration_ms").as("duration_ms")).as[MultiModal.Media])
      .collect()
    assert(feats.length === docs.count())
    // histogram is L1-normalized and deterministic
    feats.foreach(f => assert(math.abs(f.feature.sum - 1.0) < 1e-9))
    val again = MultiModal.decodeFeatures(media.select(
        col("media_id"), col("kind"), col("payload"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("meta.duration_ms").as("duration_ms")).as[MultiModal.Media])
      .collect().map(f => f.media_id -> f.feature.toSeq).toMap
    feats.foreach(f => assert(again(f.media_id) === f.feature.toSeq))

    val frames = MultiModal.frameSample(media)
    // only video rows, ≤ 4 frames each, offsets stride by 100
    val byId = frames.collect().groupBy(_.getLong(0))
    assert(byId.nonEmpty && byId.values.forall(_.length <= 4))
    byId.values.foreach { fs =>
      assert(fs.map(_.getInt(1)).sorted.toSeq === (0 until fs.length).toSeq)
      fs.foreach(r => assert(r.getLong(2) === r.getInt(1) * 100L))
    }
  }
}
