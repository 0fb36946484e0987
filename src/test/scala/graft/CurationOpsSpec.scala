package graft

import graft.engine.CurationOps

/** Curation-operator semantics on hand-computable inputs: split determinism
  * and exhaustiveness, stratified keep-rates, canonical-dup mapping, pack
  * budget respect, and bigram generation (the corpus oracle pins exact
  * values; these pin the invariants that must hold on ANY input).
  */
class CurationOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def docsDir(rows: Seq[(Long, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-cur").toString
    rows.map { case (id, text, lang) => (id, text, lang, "src0", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("domain-mix weights rebalance exactly: actual_frac · weight = target_frac") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mix").toString
    Seq((1L, "a", "srcA"), (2L, "b", "srcB"), (3L, "c", "srcC"), (4L, "d", "srcC"))
      .map { case (id, text, src) => (id, text, "en", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = CurationOps.domainMix.build(spark, dir)
      .select("source", "n_docs", "actual_frac", "weight")
      .as[(String, Long, Double, Double)].collect().sortBy(_._1).toSeq
    // 3 sources, target 1/3 each: srcA/srcB at 1/4 upsample ×4/3, srcC at
    // 1/2 downsamples ×2/3
    assert(got === Seq(
      ("srcA", 1L, 0.25, 1.3333), ("srcB", 1L, 0.25, 1.3333), ("srcC", 2L, 0.5, 0.6667)))
    got.foreach { case (_, _, actual, weight) =>
      assert(math.abs(actual * weight - 1.0 / 3) < 1e-3)
    }
  }

  test("train/test split is exhaustive, deterministic, and roughly 80/10/10") {
    val got = CurationOps.trainTestSplit.build(spark, sfDir)
      .select("split", "n_docs").as[(String, Long)].collect().toMap
    assert(got.keySet === Set("train", "valid", "test"))
    assert(got.values.sum === 500L) // every sf0.001 doc lands in exactly one split
    assert(got("train") > got("valid") + got("test")) // 80% dominates
    val again = CurationOps.trainTestSplit.build(spark, sfDir)
      .select("split", "n_docs").as[(String, Long)].collect().toMap
    assert(again === got) // rerun → identical assignment (hash, not rand)
  }

  test("stratified sample keeps ~50% of en and ~20% of the rest") {
    val sampled = CurationOps.stratifiedSample.build(spark, sfDir)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val corpus = graft.engine.Tables.documents(spark, sfDir)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val enRate = sampled("en").toDouble / corpus("en")
    assert(enRate > 0.3 && enRate < 0.7, s"en keep-rate $enRate")
    val otherRate = (sampled - "en").values.sum.toDouble / (corpus - "en").values.sum
    assert(otherRate > 0.08 && otherRate < 0.35, s"other keep-rate $otherRate")
  }

  test("canonical dedup maps every dup to the group minimum") {
    val dir = docsDir(Seq(
      (10L, "same text", "en"), (3L, "same text", "en"), (7L, "same text", "en"),
      (5L, "unique", "en")))
    val got = CurationOps.dedupCanonical.build(spark, dir)
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got === Set((3L, 3L, false), (7L, 3L, true), (10L, 3L, true), (5L, 5L, false)))
  }

  test("sequence packing: pack token totals respect the running-sum bins") {
    val packs = CurationOps.packSequences.build(spark, sfDir)
      .as[(String, Long, Long, Long)].collect()
    assert(packs.nonEmpty)
    // pack ids per lang are dense from 0 (exclusive running sum starts at 0)
    packs.groupBy(_._1).foreach { case (_, ps) =>
      val ids = ps.map(_._2).sorted
      assert(ids.head === 0L)
      assert(ids === (0L until ids.length).toArray.toSeq.toArray.sorted)
    }
    // every doc is packed exactly once
    val nDocs = packs.map(_._3).sum
    assert(nDocs === 500L)
  }

  test("bigram vocab: n tokens → n-1 bigrams in order; single token → none") {
    val dir = docsDir(Seq((1L, "a b c", "en"), (2L, "solo", "en")))
    val got = CurationOps.bigramVocab.build(spark, dir)
      .as[(String, Long)].collect().toSet
    assert(got === Set(("a b", 1L), ("b c", 1L)))
  }

  test("quota sample: exactly k per stratum (all of an under-k stratum)") {
    val rows = (1L to 30L).map(i => (i, s"doc $i", "en")) ++
      Seq((101L, "x", "de"), (102L, "y", "de"), (103L, "z", "de"))
    val dir = docsDir(rows)
    val got = CurationOps.quotaSample.build(spark, dir)
      .as[(String, Long, Int)].collect()
    assert(got.count(_._1 == "en") === 20)
    assert(got.count(_._1 == "de") === 3)
    // ranks are dense 1..k within each stratum
    assert(got.filter(_._1 == "en").map(_._3).sorted === (1 to 20))
    // the chosen set is a deterministic function of ids: a permuted rerun
    // picks the identical docs with identical ranks
    val again = CurationOps.quotaSample
      .build(spark, docsDir(scala.util.Random.shuffle(rows)))
      .as[(String, Long, Int)].collect()
    assert(again.toSet === got.toSet)
  }

  test("histogram bins partition the corpus: counts sum to row count") {
    val bins = CurationOps.histogramChars.build(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect()
    assert(bins.map(_._2).sum === 500L)
    // bin bounds are consistent: min/max of each bin lie inside [bin*100, bin*100+99]
    bins.foreach { case (bin, _, lo, hi) =>
      assert(lo >= bin * 100 && hi < (bin + 1) * 100 && lo <= hi)
    }
  }

  test("weighted sample: matches a pure-Scala DLT priority recomputation") {
    // ten docs, one source, weights = text lengths; expected top-5 computed
    // independently with java MessageDigest + the same q = w·2³²/(h+1)
    val rows = (1L to 10L).map(i => (i, "x" * (i * 7 % 13 + 3).toInt, "en"))
    val dir = docsDir(rows)
    def prio(id: Long, w: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 8)
      w.toDouble * 4294967296.0 / (java.lang.Long.parseLong(hex, 16) + 1)
    }
    val expected = rows.map { case (id, text, _) => (id, prio(id, text.length)) }
      .sortBy { case (id, p) => (-p, id) }.take(5).map(_._1)
    val got = CurationOps.weightedSample.build(spark, dir)
      .select("doc_id").as[Long].collect().toSeq
    assert(got === expected)
  }

  test("chunking: 40-token stride, 10-token overlap, short tail kept") {
    // 95 tokens → chunks at 1..50, 41..90, 81..95 (15-token tail)
    val text = (1 to 95).map(i => s"t$i").mkString(" ")
    val dir = docsDir(Seq((1L, text, "en"), (2L, "short doc", "en")))
    val got = CurationOps.chunkText.build(spark, dir)
      .select("doc_id", "chunk_idx", "n_toks", "chunk_text")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got.map(r => (r._1, r._2, r._3)) ===
      Seq((1L, 0L, 50L), (1L, 1L, 50L), (1L, 2L, 15L), (2L, 0L, 2L)))
    val c0 = got(0)._4.split(" "); val c1 = got(1)._4.split(" ")
    assert(c0.head === "t1" && c0.last === "t50")
    assert(c1.head === "t41" && c1.last === "t90")   // 10-token overlap
    assert(got(2)._4.split(" ").head === "t81")
  }

  test("dataset card: per-source rows reconcile with the corpus totals") {
    val got = CurationOps.datasetCard.build(spark, sfDir).collect()
    val total = graft.engine.Tables.documents(spark, sfDir).count()
    assert(got.map(_.getAs[Long]("n_docs")).sum === total)
    // shares sum to ~100 (each row rounded to 2 dp → ±0.01 per source)
    val pctSum = got.map(_.getAs[Double]("pct_corpus")).sum
    assert(math.abs(pctSum - 100.0) <= 0.01 * got.length, s"pct sum $pctSum")
    got.foreach { r =>
      assert(r.getAs[Long]("n_dup") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("n_langs") >= 1L)
    }
  }

  test("length buckets: boundary doc pads zero, over-budget doc truncates into the top bucket") {
    // tok = ceil(chars/4): 40→10 (bucket 64, pad 54), 256→64 (bucket 64,
    // pad 0 — the boundary), 400→100 (bucket 128, pad 28),
    // 12000→3000 (bucket 2048, kept 2048, trunc 952)
    val dir = docsDir(Seq(
      (1L, "x" * 40, "en"), (2L, "y" * 256, "en"),
      (3L, "z" * 400, "en"), (4L, "w" * 12000, "en")))
    val got = CurationOps.seqLengthBuckets.build(spark, dir)
      .select("bucket", "n_docs", "kept_tokens", "pad_tokens", "pad_pct",
        "trunc_tokens", "n_trunc")
      .as[(Long, Long, Long, Long, Double, Long, Long)].collect().toSeq
    assert(got === Seq(
      (64L, 2L, 74L, 54L, 42.1875, 0L, 0L),
      (128L, 1L, 100L, 28L, 21.875, 0L, 0L),
      (2048L, 1L, 2048L, 0L, 0.0, 952L, 1L)))
  }
}
