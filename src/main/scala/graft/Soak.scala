package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off 10× scale soak (not part of the contract): replicates sf0.1 ten
  * times with shifted keys and times the shuffle/join-heavy operators,
  * looking for super-linear cliffs that sf0.1 hides.
  */
object Soak {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val src = "/root/testdata/sf0.1"
    val dir = "/tmp/graft_soak_sf1"

    graft.engine.Tables.prepare(spark)
    val ev = graft.engine.Tables.events(spark, src)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    val evN = ev.count()
    (0 until 10).map { i =>
      ev.withColumn("event_id", col("event_id") + lit(i * evN))
        .withColumn("user_id", col("user_id") + lit(i * 10000L))
        .withColumn("ts", expr(s"ts + INTERVAL ${i * 31} DAYS"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    // source values are kept verbatim so the src0-scoped postings join
    // (llm_jaccard_pairs) really sees 10× its corpus — the df-cap is what
    // keeps that join linear, and this soak is where that claim is measured
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val dN = docs.count()
    (0 until 10).map { i =>
      docs.withColumn("doc_id", col("doc_id") + lit(i * dN))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val eN = emb.count()
    (0 until 10).map { i =>
      emb.withColumn("vec_id", col("vec_id") + lit(i * eN))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    // SPARK_GRAFT_SOAK_ONLY=a,b,c restricts the run to the named queries
    // (dev loop for newly added heavy ops; unset = the full list).
    val only = sys.env.get("SPARK_GRAFT_SOAK_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val heavy = Seq(
      "win_sessionize", "agg_salted_skew", "llm_dedup_hash", "llm_minhash_pairs",
      "llm_tfidf", "llm_ann_lsh", "llm_ann_ivf", "llm_knn_cosine",
      "llm_neardup_cosine", "llm_jaccard_pairs", "llm_shingle_jaccard",
      "text_simhash", "stream_session_window",
      // the soak dir replicates only events/documents/embeddings, so the
      // list stays within those tables
      "llm_decontaminate", "llm_curation_pipeline", "llm_quantize_int8",
      "agg_approx_topk",
      // 10× verbatim replication is the boilerplate df-counter's hot-key
      // worst case (every trigram's df multiplies by 10) — soaked on
      // purpose. text_levenshtein_pairs is deliberately NOT here: verbatim
      // replication multiplies its (lang, n_tok) block density by 10 and
      // pair work by up to 100, and the block cap then bounds work at
      // cardinality × cap²/2 ≈ 10⁶ O(len²) kernels — a fixed worst-case
      // cost (~minutes) that measures the cap, not scaling; the cap
      // behavior is spec-pinned instead (TextOpsSpec over-cap test).
      "text_boilerplate_ngrams", "text_pii_scrub",
      "llm_embed_dim_stats", "log_resample_fill", "llm_quota_sample",
      // verbatim 10× replication makes EVERY doc a full duplicate (each
      // gram's df ≥ 10), so dup_span_fraction soaks its worst case: the
      // gram-df join fans out 10× rows but stays linear — no pairwise term
      "llm_dup_span_fraction", "text_unigram_logprob", "log_compact_latest",
      "log_peak_concurrency", "llm_centroid_assign", "llm_embed_outliers",
      // round 3: the rewritten single-pass as-of merge (was the per-user
      // errors × purchases fanout), semdedup's within-cluster grid (10×
      // vectors → 100× within-cluster pairs, distributed over c_id×grid
      // cells), the digest-join dataset card, and the islands window
      "join_asof_events", "llm_semdedup", "llm_dataset_card", "log_event_runs",
      "log_multiline_stitch", "log_latency_percentiles",
      "llm_embed_corr_pairs", "log_session_durations",
      "log_type_affinity", "log_type_transitions", "llm_neardup_filter",
      "log_rolling_wau",
      // round 4: iterative CC (one job per round + pointer jumping) and
      // the k-means Lloyd loop — both fixed-round corpus-scan ops
      "llm_neardup_clusters", "llm_kmeans",
      // round 4b: bigram-LM scoring (bigram-vocab joins), the PageRank
      // power-iteration rounds, HLL sketch union, the Bloom probe, IVF-PQ
      // (train + encode + ADC + re-rank), and the winnow postings pair scan
      // (10× verbatim replication = every fingerprint's df ×10, the df-cap's
      // designed worst case)
      "text_bigram_logprob", "log_pagerank_types", "agg_hll_union_daily",
      "llm_bloom_decontaminate", "llm_ann_ivfpq",
      "text_winnow_fingerprints", "text_winnow_pairs",
      // round 4c: BPE rounds are vocab-sized (10× verbatim replication
      // leaves the vocabulary unchanged — only the corpus→counts scan
      // grows), hard negatives are the knn scan shape, and the stream-twin
      // HLL window agg is sketch-state bounded
      "text_bpe_merges", "llm_hard_negatives", "stream_hll_tumbling",
      // round 4d: BPE apply (vocab join), engine-iterated recursive CTE,
      // and the logistic-GD trainer (per-round corpus scan, 4-key gradient)
      "text_bpe_apply", "sql_recursive_reach", "text_quality_classifier")
    heavy.filter(n => only.forall(_.contains(n))).foreach { name =>
      val fn = SparkEntry.queries(name)
      try { fn(spark, dir).count() } catch { case _: Throwable => () } // warm
      val t0 = System.nanoTime()
      val n = try fn(spark, dir).count() catch { case e: Throwable =>
        println(f"$name%-22s FAILED: ${e.getMessage.take(120)}"); -1L }
      if (n >= 0) println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    spark.stop()
  }
}
